"""BN254 extension-field towers (Fq2/Fq6/Fq12) in pure Python.

This is the verifier-oracle layer: slow, simple, obviously-correct bigint
arithmetic used to check proofs produced by the TPU prover (the role the
reference delegates to arkworks in packages/rust-verifier/src/verifier_utils.rs).

Tower: Fq2 = Fq[u]/(u^2+1),  Fq6 = Fq2[v]/(v^3 - xi) with xi = 9+u,
       Fq12 = Fq6[w]/(w^2 - v).
"""

from __future__ import annotations

from dataclasses import dataclass

from .field import Q

P = Q


# --------------------------------------------------------------------------- Fq2
@dataclass(frozen=True)
class Fq2:
    c0: int
    c1: int

    def __add__(self, o):
        return Fq2((self.c0 + o.c0) % P, (self.c1 + o.c1) % P)

    def __sub__(self, o):
        return Fq2((self.c0 - o.c0) % P, (self.c1 - o.c1) % P)

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq2(self.c0 * o % P, self.c1 * o % P)
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        return Fq2((a0 * b0 - a1 * b1) % P, (a0 * b1 + a1 * b0) % P)

    __rmul__ = __mul__

    def __neg__(self):
        return Fq2((-self.c0) % P, (-self.c1) % P)

    def sq(self):
        a0, a1 = self.c0, self.c1
        return Fq2((a0 + a1) * (a0 - a1) % P, 2 * a0 * a1 % P)

    def inv(self):
        norm = (self.c0 * self.c0 + self.c1 * self.c1) % P
        n_inv = pow(norm, -1, P)
        return Fq2(self.c0 * n_inv % P, (-self.c1) * n_inv % P)

    def conj(self):
        return Fq2(self.c0, (-self.c1) % P)

    def is_zero(self):
        return self.c0 == 0 and self.c1 == 0

    def __pow__(self, e: int):
        result = FQ2_ONE
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.sq()
            e >>= 1
        return result

    def sqrt(self):
        """Square root in Fq2 (q = 3 mod 4 case); None if not a QR."""
        if self.is_zero():
            return self
        a1 = self ** ((P - 3) // 4)
        alpha = a1.sq() * self
        x0 = a1 * self
        if alpha == Fq2(P - 1, 0):
            cand = Fq2(0, 1) * x0
        else:
            b = (alpha + FQ2_ONE) ** ((P - 1) // 2)
            cand = b * x0
        return cand if cand.sq() == self else None


FQ2_ZERO = Fq2(0, 0)
FQ2_ONE = Fq2(1, 0)
XI = Fq2(9, 1)  # the sextic-twist residue


# --------------------------------------------------------------------------- Fq6
@dataclass(frozen=True)
class Fq6:
    c0: Fq2
    c1: Fq2
    c2: Fq2

    def __add__(self, o):
        return Fq6(self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return Fq6(self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return Fq6(-self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        if isinstance(o, (int, Fq2)):
            return Fq6(self.c0 * o, self.c1 * o, self.c2 * o)
        a0, a1, a2 = self.c0, self.c1, self.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        t0, t1, t2 = a0 * b0, a1 * b1, a2 * b2
        c0 = t0 + XI * ((a1 + a2) * (b1 + b2) - t1 - t2)
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + XI * t2
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fq6(c0, c1, c2)

    __rmul__ = __mul__

    def sq(self):
        return self * self

    def mul_by_v(self):
        """multiply by v: (c0,c1,c2) -> (xi*c2, c0, c1)"""
        return Fq6(XI * self.c2, self.c0, self.c1)

    def inv(self):
        a0, a1, a2 = self.c0, self.c1, self.c2
        t0 = a0.sq() - XI * (a1 * a2)
        t1 = XI * a2.sq() - a0 * a1
        t2 = a1.sq() - a0 * a2
        d = (a0 * t0 + XI * (a2 * t1 + a1 * t2)).inv()
        return Fq6(t0 * d, t1 * d, t2 * d)

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()


FQ6_ZERO = Fq6(FQ2_ZERO, FQ2_ZERO, FQ2_ZERO)
FQ6_ONE = Fq6(FQ2_ONE, FQ2_ZERO, FQ2_ZERO)


# -------------------------------------------------------------------------- Fq12
@dataclass(frozen=True)
class Fq12:
    c0: Fq6
    c1: Fq6

    def __add__(self, o):
        return Fq12(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq12(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq12(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, (int, Fq2, Fq6)):
            return Fq12(self.c0 * o, self.c1 * o)
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        c0 = t0 + t1.mul_by_v()
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1
        return Fq12(c0, c1)

    __rmul__ = __mul__

    def sq(self):
        return self * self

    def inv(self):
        # (a0 + a1 w)^-1 = (a0 - a1 w) / (a0^2 - v a1^2)
        d = (self.c0.sq() - self.c1.sq().mul_by_v()).inv()
        return Fq12(self.c0 * d, -(self.c1 * d))

    def conj(self):
        """w -> -w conjugation (the q^6 Frobenius)."""
        return Fq12(self.c0, -self.c1)

    def __pow__(self, e: int):
        if e < 0:
            return self.inv() ** (-e)
        result = FQ12_ONE
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.sq()
            e >>= 1
        return result

    def is_one(self):
        return self == FQ12_ONE


FQ12_ZERO = Fq12(FQ6_ZERO, FQ6_ZERO)
FQ12_ONE = Fq12(FQ6_ONE, FQ6_ZERO)


def fq12_from_fq(x: int) -> Fq12:
    return Fq12(Fq6(Fq2(x % P, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)


def fq12_from_fq2(x: Fq2, power_of_w: int = 0) -> Fq12:
    """Embed an Fq2 element times w^k (k in 0..5, w^2 = v)."""
    coeffs = [[FQ2_ZERO] * 3, [FQ2_ZERO] * 3]  # [w-part][v-part]
    coeffs[power_of_w % 2][power_of_w // 2] = x
    return Fq12(Fq6(*coeffs[0]), Fq6(*coeffs[1]))
