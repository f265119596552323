"""Pallas fused-CIOS Montgomery multiply: limb-exact parity with the JAX
path and python-int ground truth (interpret mode; compiled path exercised on
TPU by bench.py)."""

import random

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.core import field as F
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.ops import pallas_field as PF


def _rand_batch(spec, n, seed):
    rng = random.Random(seed)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    return vals, jnp.asarray(LB.ints_to_limbs(np.array(vals, dtype=object)))


def test_mont_mul_parity_fq():
    n = 1500  # exercises padding (not a multiple of the 1024-lane tile)
    av, a = _rand_batch(LB.FQ_SPEC, n, 1)
    bv, b = _rand_batch(LB.FQ_SPEC, n, 2)
    ref = LB.mont_mul(LB.FQ_SPEC, a, b)
    out = PF.mont_mul(LB.FQ_SPEC, a, b, interpret=True)
    assert (np.asarray(ref) == np.asarray(out)).all()
    outi = LB.limbs_to_ints(np.asarray(out))
    rinv = pow(F.MONT_R, -1, F.FQ.p)
    assert all(int(outi[i]) == av[i] * bv[i] * rinv % F.FQ.p for i in range(n))


def test_mont_mul_parity_fr_edge_values():
    spec = LB.FR_SPEC
    vals = [0, 1, spec.p - 1, spec.p - 2, F.MONT_R % spec.p, 2]
    n = len(vals)
    a = jnp.asarray(LB.ints_to_limbs(np.array(vals, dtype=object)))
    b = jnp.asarray(LB.ints_to_limbs(np.array(list(reversed(vals)), dtype=object)))
    ref = LB.mont_mul(spec, a, b)
    out = PF.mont_mul(spec, a, b, interpret=True)
    assert (np.asarray(ref) == np.asarray(out)).all()


def test_mont_mul_broadcasting():
    _, a = _rand_batch(LB.FQ_SPEC, 6, 3)
    _, b = _rand_batch(LB.FQ_SPEC, 1, 4)
    a = a.reshape(F.LIMBS, 2, 3)
    ref = LB.mont_mul(LB.FQ_SPEC, a, b.reshape(F.LIMBS, 1, 1))
    out = PF.mont_mul(LB.FQ_SPEC, a, b.reshape(F.LIMBS, 1, 1), interpret=True)
    assert (np.asarray(ref) == np.asarray(out)).all()
