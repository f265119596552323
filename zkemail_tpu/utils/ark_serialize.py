"""Decoder for arkworks compressed BN254 points (the reference rust-verifier's
wire format, packages/rust-verifier/src/main.rs:81-104).

Compressed short-Weierstrass encoding (ark-serialize 0.4):
  * G1: 32 bytes little-endian x; top two bits of the final byte are flags.
  * G2: c0 then c1 of x (32 bytes LE each); flags on the final byte of c1.
  * flags: 0b0100_0000 = point at infinity; 0b1000_0000 = y is the
    lexicographically largest root.
"""

from __future__ import annotations

from ..core.field import Q
from ..core.towers import Fq2
from ..core.curve import B_G1, B_G2, G1, G2

INF_FLAG = 0x40
Y_LARGEST_FLAG = 0x80


def _sqrt_fq(a: int) -> int | None:
    # q = 3 mod 4
    r = pow(a, (Q + 1) // 4, Q)
    return r if r * r % Q == a % Q else None


def decode_g1(data: bytes) -> G1:
    assert len(data) == 32
    raw = bytearray(data)
    flags = raw[31] & 0xC0
    raw[31] &= 0x3F
    x = int.from_bytes(bytes(raw), "little")
    if flags & INF_FLAG:
        return G1.identity()
    y = _sqrt_fq((x * x * x + B_G1) % Q)
    if y is None:
        raise ValueError("x not on curve")
    y_neg = Q - y
    largest, smallest = max(y, y_neg), min(y, y_neg)
    y = largest if (flags & Y_LARGEST_FLAG) else smallest
    pt = G1(x, y)
    assert pt.on_curve()
    return pt


def decode_g2(data: bytes) -> G2:
    assert len(data) == 64
    raw = bytearray(data)
    flags = raw[63] & 0xC0
    raw[63] &= 0x3F
    c0 = int.from_bytes(bytes(raw[:32]), "little")
    c1 = int.from_bytes(bytes(raw[32:]), "little")
    if flags & INF_FLAG:
        return G2.identity()
    x = Fq2(c0, c1)
    y = (x * x * x + B_G2).sqrt()
    if y is None:
        raise ValueError("x not on twist curve")
    y_neg = -y
    # lexicographic order on (c1, c0), matching arkworks' QuadExtField cmp
    def key(v: Fq2):
        return (v.c1, v.c0)

    largest = y if key(y) > key(y_neg) else y_neg
    smallest = y_neg if largest == y else y
    y = largest if (flags & Y_LARGEST_FLAG) else smallest
    pt = G2(x, y)
    assert pt.on_curve()
    return pt


def decode_fr(data: bytes) -> int:
    assert len(data) == 32
    return int.from_bytes(data, "little")


def decode_vkey(data: bytes):
    """arkworks VerifyingKey<Bn254> compressed layout:
    alpha_g1 | beta_g2 | gamma_g2 | delta_g2 | u64 n | n * gamma_abc_g1."""
    off = 0
    alpha = decode_g1(data[off : off + 32]); off += 32
    beta = decode_g2(data[off : off + 64]); off += 64
    gamma = decode_g2(data[off : off + 64]); off += 64
    delta = decode_g2(data[off : off + 64]); off += 64
    n = int.from_bytes(data[off : off + 8], "little"); off += 8
    ic = []
    for _ in range(n):
        ic.append(decode_g1(data[off : off + 32])); off += 32
    assert off == len(data), (off, len(data))
    return {"alpha_g1": alpha, "beta_g2": beta, "gamma_g2": gamma,
            "delta_g2": delta, "ic": ic}
