"""Poseidon tests: parameter generation anchors, reference properties, JAX parity."""

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.core import field as F
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.core.poseidon import (
    N_ROUNDS_P,
    poseidon,
    poseidon_ex,
    poseidon_large,
    poseidon_modular,
    poseidon_params,
)
from zkemail_tpu.core.poseidon_jax import poseidon_jax


def test_grain_anchors():
    """The Grain stream reproduces circomlib's published parameter values."""
    consts, mds = poseidon_params(3)
    assert consts[0] == 0x0EE9A592BA9A9518D05986D656F40C2114C4993C11BB29938D21D47304CD8E6E
    assert consts[1] == 0x00F1445235F2148C5986587169FC1BCD887B08D4D00868DF5696FFF40956E864
    assert mds[0][0] == 0x109B7F411BA0E4C9B2B70CAF5C36A7B194BE7C11AD24378BFEDB68592BA8118B


def test_circomlib_golden_vectors():
    """Bit-exact parity with circomlibjs (the reference's hashing stack,
    packages/helpers/src/hash.ts): the canonical published test vectors."""
    assert poseidon([1]) == 18586133768512220936620570745912940619677854269274689475585506675881198879027
    assert poseidon([1, 2]) == 7853200120776062878684798364095072458815029376092732009249414926327459813530
    # determinism / distinctness
    assert poseidon([2, 1]) != poseidon([1, 2])
    assert poseidon([0]) != poseidon([0, 0])


def test_poseidon_ex():
    out = poseidon_ex([1, 2], initial_state=0, n_outs=3)
    assert out[0] == poseidon([1, 2])
    assert len(out) == 3


def test_all_widths_run():
    for n in range(1, 17):
        v = poseidon(list(range(1, n + 1)))
        assert 0 < v < F.R


def test_poseidon_large_matches_manual():
    # 9 chunks of 242 bits from a 2048-bit-ish value, mirrors pubkey hashing
    val = 123456789 * (1 << 2000) + 987654321
    h = poseidon_large(val, 121, 9)
    mask = (1 << 121) - 1
    chunks = [(val >> (i * 121)) & mask for i in range(18)]
    merged = [chunks[2 * i] + (chunks[2 * i + 1] << 121) for i in range(9)]
    assert h == poseidon(merged)


def test_poseidon_modular():
    vals = list(range(1, 40))  # 3 chunks: 16, 16, 7
    h = poseidon_modular(vals)
    c0, c1, c2 = poseidon(vals[:16]), poseidon(vals[16:32]), poseidon(vals[32:])
    assert h == poseidon([poseidon([c0, c1]), c2])


def test_jax_matches_reference():
    pf = F.FR
    batch = 4
    for n in (1, 2, 9):
        inputs = [[(i * 37 + b * 101 + 7) % pf.p for b in range(batch)] for i in range(n)]
        arrs = np.zeros((F.LIMBS, n, batch), dtype=np.int32)
        for i in range(n):
            arrs[:, i, :] = LB.ints_to_limbs([pf.to_mont(x) for x in inputs[i]])
        out = poseidon_jax(jnp.asarray(arrs))
        got = LB.limbs_to_ints(np.asarray(out))
        for b in range(batch):
            expect = pf.to_mont(poseidon([inputs[i][b] for i in range(n)]))
            assert int(got[b]) == expect, (n, b)
