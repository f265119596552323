"""BN254 field constants and pure-Python reference arithmetic.

This is the scalar "ground truth" layer: every JAX/Pallas kernel in
``zkemail_tpu.core.limbs`` and ``zkemail_tpu.ops`` is golden-tested against the
Python-int implementations here.

Reference semantics: the upstream stack works over the same two fields —
the BN254 scalar field Fr (circom's native field, see
/root/reference/packages/helpers/src/constants.ts:1) and the base field Fq for
Groth16 group arithmetic (packages/rust-verifier uses arkworks Bn254).
"""

from __future__ import annotations

from dataclasses import dataclass

# BN254 (alt_bn128) parameters.
# Curve seed x, q = 36x^4 + 36x^3 + 24x^2 + 6x + 1, r = 36x^4 + 36x^3 + 18x^2 + 6x + 1
BN254_X = 4965661367192848881

# Base field modulus (Fq): coordinates of G1 points.
Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# Scalar field modulus (Fr): circuit signals / witness values live here.
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

assert Q == 36 * BN254_X**4 + 36 * BN254_X**3 + 24 * BN254_X**2 + 6 * BN254_X + 1
assert R == 36 * BN254_X**4 + 36 * BN254_X**3 + 18 * BN254_X**2 + 6 * BN254_X + 1

# Limb scheme for the TPU vector core: LIMBS limbs of LIMB_BITS bits each,
# least-significant first.  12-bit limbs keep every partial product below
# 2^24 and every deferred-carry accumulation below 2^31, so the whole
# Montgomery pipeline runs exactly in int32 VPU lanes (no int64 emulation).
LIMB_BITS = 12
LIMBS = 22
LIMB_MASK = (1 << LIMB_BITS) - 1
MONT_BITS = LIMB_BITS * LIMBS  # 264
MONT_R = 1 << MONT_BITS


def inv_mod(a: int, m: int) -> int:
    """Modular inverse via Python's built-in extended gcd."""
    return pow(a, -1, m)


@dataclass(frozen=True)
class PrimeField:
    """A prime field with Montgomery parameters for the limb scheme."""

    p: int
    name: str

    @property
    def r_mod_p(self) -> int:
        return MONT_R % self.p

    @property
    def r2_mod_p(self) -> int:
        return (MONT_R * MONT_R) % self.p

    @property
    def n0inv(self) -> int:
        """-p^-1 mod 2^LIMB_BITS (per-limb Montgomery factor)."""
        return (-inv_mod(self.p, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    # -- scalar reference ops -------------------------------------------------
    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def inv(self, a: int) -> int:
        return inv_mod(a, self.p)

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def to_mont(self, a: int) -> int:
        return (a * MONT_R) % self.p

    def from_mont(self, a: int) -> int:
        return (a * inv_mod(MONT_R, self.p)) % self.p


FQ = PrimeField(Q, "Fq")
FR = PrimeField(R, "Fr")


def to_limbs(x: int, n_limbs: int = LIMBS, limb_bits: int = LIMB_BITS) -> list[int]:
    """Split a nonnegative int into little-endian limbs."""
    mask = (1 << limb_bits) - 1
    out = []
    for _ in range(n_limbs):
        out.append(x & mask)
        x >>= limb_bits
    if x:
        raise ValueError("value does not fit in the given limb count")
    return out


def from_limbs(limbs, limb_bits: int = LIMB_BITS) -> int:
    """Recombine little-endian limbs (ints) into a Python int."""
    x = 0
    for i, l in enumerate(limbs):
        x += int(l) << (i * limb_bits)
    return x


# --- Fr primitive root of unity machinery (for NTT domains) -----------------
# r - 1 = 2^28 * 81540058820840996586704275553141814055101440848469862132140264610111
# so Fr supports radix-2 NTT up to size 2^28.
FR_TWO_ADICITY = 28
_FR_ODD = (R - 1) >> FR_TWO_ADICITY
assert _FR_ODD * (1 << FR_TWO_ADICITY) == R - 1

# 5 is a generator of Fr* (standard for BN254 Fr; verified in tests).
FR_MULT_GENERATOR = 5
FR_ROOT_OF_UNITY = pow(FR_MULT_GENERATOR, _FR_ODD, R)  # order 2^28


def fr_nth_root(log2_n: int) -> int:
    """Primitive 2^log2_n-th root of unity in Fr."""
    if log2_n > FR_TWO_ADICITY:
        raise ValueError("domain too large for Fr two-adicity")
    w = FR_ROOT_OF_UNITY
    for _ in range(FR_TWO_ADICITY - log2_n):
        w = (w * w) % R
    return w
