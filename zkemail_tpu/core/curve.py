"""BN254 curve reference implementation + optimal-ate pairing (pure Python).

The oracle for everything the TPU prover produces: G1/G2 group law, subgroup
checks, and the pairing used for Groth16 verification — mirroring the role of
arkworks in the reference (packages/rust-verifier/src/verifier_utils.rs:20-23,
GrothBn = Groth16<Bn254, CircomReduction>).
"""

from __future__ import annotations

from dataclasses import dataclass

from .field import BN254_X, Q, R
from .towers import (
    FQ2_ONE,
    FQ2_ZERO,
    FQ12_ONE,
    Fq2,
    Fq12,
    XI,
    fq12_from_fq,
)

P = Q
B_G1 = 3
B_G2 = Fq2(3, 0) * XI.inv()  # twist coefficient 3/(9+u)

G1_GEN = (1, 2)
G2_GEN = (
    Fq2(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    Fq2(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


# --------------------------------------------------------------------- G1 affine
@dataclass(frozen=True)
class G1:
    x: int
    y: int
    inf: bool = False

    @staticmethod
    def identity():
        return G1(0, 0, True)

    @staticmethod
    def generator():
        return G1(*G1_GEN)

    def on_curve(self) -> bool:
        if self.inf:
            return True
        return (self.y * self.y - self.x**3 - B_G1) % P == 0

    def neg(self):
        if self.inf:
            return self
        return G1(self.x, (-self.y) % P)

    def add(self, o: "G1") -> "G1":
        if self.inf:
            return o
        if o.inf:
            return self
        if self.x == o.x:
            if (self.y + o.y) % P == 0:
                return G1.identity()
            lam = (3 * self.x * self.x) * pow(2 * self.y, -1, P) % P
        else:
            lam = (o.y - self.y) * pow(o.x - self.x, -1, P) % P
        x3 = (lam * lam - self.x - o.x) % P
        y3 = (lam * (self.x - x3) - self.y) % P
        return G1(x3, y3)

    def mul(self, k: int) -> "G1":
        k %= R
        acc, base = G1.identity(), self
        while k:
            if k & 1:
                acc = acc.add(base)
            base = base.add(base)
            k >>= 1
        return acc


# --------------------------------------------------------------------- G2 affine
@dataclass(frozen=True)
class G2:
    x: Fq2
    y: Fq2
    inf: bool = False

    @staticmethod
    def identity():
        return G2(FQ2_ZERO, FQ2_ZERO, True)

    @staticmethod
    def generator():
        return G2(*G2_GEN)

    def on_curve(self) -> bool:
        if self.inf:
            return True
        return self.y.sq() == self.x * self.x * self.x + B_G2

    def neg(self):
        if self.inf:
            return self
        return G2(self.x, -self.y)

    def add(self, o: "G2") -> "G2":
        if self.inf:
            return o
        if o.inf:
            return self
        if self.x == o.x:
            if (self.y + o.y).is_zero():
                return G2.identity()
            lam = (self.x.sq() * 3) * (self.y * 2).inv()
        else:
            lam = (o.y - self.y) * (o.x - self.x).inv()
        x3 = lam.sq() - self.x - o.x
        y3 = lam * (self.x - x3) - self.y
        return G2(x3, y3)

    def mul(self, k: int) -> "G2":
        k %= R
        acc, base = G2.identity(), self
        while k:
            if k & 1:
                acc = acc.add(base)
            base = base.add(base)
            k >>= 1
        return acc

    def in_subgroup(self) -> bool:
        return self.mul(R).inf if not self.inf else True


# ----------------------------------------------------- pairing (optimal ate)
ATE_LOOP_COUNT = 6 * BN254_X + 2


def _untwist(q: G2) -> tuple[Fq12, Fq12]:
    """psi: E'(Fq2) -> E(Fq12), (x,y) -> (x*w^2, y*w^3)."""
    from .towers import fq12_from_fq2

    return (
        fq12_from_fq2(q.x, power_of_w=2),
        fq12_from_fq2(q.y, power_of_w=3),
    )


def _line(ax: Fq12, ay: Fq12, bx: Fq12, by: Fq12, px: Fq12, py: Fq12):
    """Line through A, B (or tangent at A if A==B) evaluated at P; returns
    (value, (cx, cy) of A+B)."""
    if ax == bx and ay == by:
        lam = ax.sq() * 3 * (ay * 2).inv()
    elif ax == bx:
        # vertical line
        x3 = None
        return px - ax, (None, None)
    else:
        lam = (by - ay) * (bx - ax).inv()
    value = py - ay - lam * (px - ax)
    x3 = lam.sq() - ax - bx
    y3 = lam * (ax - x3) - ay
    return value, (x3, y3)


def miller_loop(p: G1, q: G2) -> Fq12:
    if p.inf or q.inf:
        return FQ12_ONE
    qx, qy = _untwist(q)
    px, py = fq12_from_fq(p.x), fq12_from_fq(p.y)
    tx, ty = qx, qy
    f = FQ12_ONE
    bits = bin(ATE_LOOP_COUNT)[2:]
    for bit in bits[1:]:
        val, (tx2, ty2) = _line(tx, ty, tx, ty, px, py)
        f = f.sq() * val
        tx, ty = tx2, ty2
        if bit == "1":
            val, (tx2, ty2) = _line(tx, ty, qx, qy, px, py)
            f = f * val
            tx, ty = tx2, ty2
    # frobenius correction steps: T += pi(Q); T -= pi^2(Q)
    q1x, q1y = qx ** Q, qy ** Q
    q2x, q2y = q1x ** Q, q1y ** Q
    val, (tx, ty) = _line(tx, ty, q1x, q1y, px, py)
    f = f * val
    val, (tx, ty) = _line(tx, ty, q2x, -q2y, px, py)
    f = f * val
    return f


_FINAL_EXP = (Q**12 - 1) // R


def final_exponentiation(f: Fq12) -> Fq12:
    # easy part via conjugation/inversion speeds this up ~3x; plain pow is
    # fine for an oracle
    return f**_FINAL_EXP


def pairing(p: G1, q: G2) -> Fq12:
    return final_exponentiation(miller_loop(p, q))


def multi_pairing_is_one(pairs: list[tuple[G1, G2]]) -> bool:
    """prod e(Pi, Qi) == 1, with a single shared final exponentiation."""
    f = FQ12_ONE
    for p, q in pairs:
        f = f * miller_loop(p, q)
    return final_exponentiation(f).is_one()
