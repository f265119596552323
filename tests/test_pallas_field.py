"""Pallas fused-CIOS Montgomery multiply: limb-exact parity with the JAX
path and python-int ground truth (interpret mode; compiled path exercised on
TPU by bench.py)."""

import os
import random

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_ec_add_g1_fused_parity():
    """Fused Pallas EC add == composed curve_jax.ec_add, incl. identity
    lanes, doubling lanes (p == q), and the signed-negation path."""
    import random as _random

    from zkemail_tpu.core import curve_jax as CJ
    from zkemail_tpu.core.curve import G1
    from zkemail_tpu.ops.msm import points_from_affine_ints

    rng = _random.Random(9)
    n = 1100  # exercises tile padding
    pts_a, pts_b = [], []
    for i in range(n):
        pa = G1.generator().mul(rng.randrange(1, 10**9))
        if i % 7 == 0:
            pb = G1.identity()
        elif i % 5 == 0:
            pb = pa  # doubling case of the complete formula
        else:
            pb = G1.generator().mul(rng.randrange(1, 10**9))
        pts_a.append(pa)
        pts_b.append(pb)

    def dev(pts):
        return points_from_affine_ints(
            CJ.FQ_OPS,
            [0 if p.inf else p.x for p in pts],
            [1 if p.inf else p.y for p in pts],
            [p.inf for p in pts],
        )

    p, q = dev(pts_a), dev(pts_b)
    neg = jnp.asarray([i % 3 == 0 for i in range(n)], dtype=jnp.int32)

    ref_q = CJ.ec_select(CJ.FQ_OPS, neg != 0, CJ.ec_neg(CJ.FQ_OPS, q), q)
    ref = CJ.ec_add(CJ.FQ_OPS, p, ref_q)
    # eager-math mirror of the kernel body (the pallas plumbing reuses the
    # proven mont-kernel BlockSpec pattern; the compiled path is exercised
    # on TPU by bench.py and cross-checked against msm_multi_chunked)
    out = PF.ec_add_g1_eager_math(p, q, neg)
    for k in ("x", "y", "z"):
        assert (np.asarray(ref[k]) == np.asarray(out[k])).all(), k
    # unsigned form
    ref2 = CJ.ec_add(CJ.FQ_OPS, p, q)
    out2 = PF.ec_add_g1_eager_math(p, q, jnp.zeros((n,), jnp.int32))
    for k in ("x", "y", "z"):
        assert (np.asarray(ref2[k]) == np.asarray(out2[k])).all(), k


_SLOW_KERNELS = pytest.mark.skipif(
    os.environ.get("ZKEMAIL_SLOW_KERNEL_TESTS") != "1",
    reason="interpret-mode EC kernels take minutes (CI `kernels` job runs them)",
)


@_SLOW_KERNELS
def test_ec_add_g1_pallas_call_interpret():
    """Exercise the fused G1 kernel's pallas_call plumbing (7 inputs, 3
    outputs, BlockSpecs, grid) in interpret mode over one padded tile — a
    wiring mistake would otherwise surface only on a live TPU (ADVICE r4).

    ~4 min: interpret mode dispatches each fori-loop iteration eagerly;
    gated like the slow mesh tests. The live-TPU compiled path is verified
    by the MSM equality tests and every bench run."""
    import random as _random

    from zkemail_tpu.core import curve_jax as CJ
    from zkemail_tpu.core.curve import G1
    from zkemail_tpu.ops.msm import points_from_affine_ints

    rng = _random.Random(21)
    n = 40  # < one 1024-lane tile: exercises the pad path
    pts_a = [G1.generator().mul(rng.randrange(1, 10**9)) for _ in range(n)]
    pts_b = [G1.generator().mul(rng.randrange(1, 10**9)) for _ in range(n)]
    pts_b[0] = G1.identity()
    pts_b[3] = pts_a[3]

    def dev(pts):
        return points_from_affine_ints(
            CJ.FQ_OPS,
            [0 if p.inf else p.x for p in pts],
            [1 if p.inf else p.y for p in pts],
            [p.inf for p in pts],
        )

    p, q = dev(pts_a), dev(pts_b)
    neg = jnp.asarray([i % 3 == 0 for i in range(n)], dtype=jnp.int32)
    ref_q = CJ.ec_select(CJ.FQ_OPS, neg != 0, CJ.ec_neg(CJ.FQ_OPS, q), q)
    ref = CJ.ec_add(CJ.FQ_OPS, p, ref_q)
    out = PF.ec_add_g1(p, q, neg, interpret=True)
    for k in ("x", "y", "z"):
        assert (np.asarray(ref[k]) == np.asarray(out[k])).all(), k


@_SLOW_KERNELS
def test_ec_add_g2_pallas_call_interpret():
    """Same for the G2 kernel's plumbing: 12 coordinate inputs + neg spec +
    6 outputs through pallas_call in interpret mode (ADVICE r4)."""
    import random as _random

    from zkemail_tpu.core import curve_jax as CJ
    from zkemail_tpu.core.curve import G2
    from zkemail_tpu.ops.msm import g2_points_from_affine

    rng = _random.Random(22)
    n = 24
    pts_a = [G2.generator().mul(rng.randrange(1, 10**9)) for _ in range(n)]
    pts_b = [G2.generator().mul(rng.randrange(1, 10**9)) for _ in range(n)]
    pts_b[0] = G2.identity()
    pts_b[3] = pts_a[3]

    def dev(pts):
        return g2_points_from_affine(
            [p.x.c0 for p in pts],
            [p.x.c1 for p in pts],
            [p.y.c0 for p in pts],
            [p.y.c1 for p in pts],
            [p.inf for p in pts],
        )

    p, q = dev(pts_a), dev(pts_b)
    neg = jnp.asarray([i % 3 == 0 for i in range(n)], dtype=jnp.int32)
    ops = CJ.FQ2_OPS
    ref_q = CJ.ec_select(ops, neg != 0, CJ.ec_neg(ops, q), q)
    ref = CJ.ec_add(ops, p, ref_q)
    out = PF.ec_add_g2(p, q, neg, interpret=True)
    for k in ("x", "y", "z"):
        for c in (0, 1):
            assert (np.asarray(ref[k][c]) == np.asarray(out[k][c])).all(), (k, c)


def test_ec_add_g2_fused_parity():
    """Fused Pallas G2 (Fq2) EC add == composed curve_jax.ec_add over
    FQ2_OPS, incl. identity lanes, doubling lanes, and signed negation."""
    import random as _random

    from zkemail_tpu.core import curve_jax as CJ
    from zkemail_tpu.core.curve import G2
    from zkemail_tpu.ops.msm import g2_points_from_affine

    rng = _random.Random(11)
    n = 1100  # exercises tile padding
    pts_a, pts_b = [], []
    for i in range(n):
        pa = G2.generator().mul(rng.randrange(1, 10**9))
        if i % 7 == 0:
            pb = G2.identity()
        elif i % 5 == 0:
            pb = pa  # doubling case of the complete formula
        else:
            pb = G2.generator().mul(rng.randrange(1, 10**9))
        pts_a.append(pa)
        pts_b.append(pb)

    def dev(pts):
        return g2_points_from_affine(
            [p.x.c0 for p in pts],
            [p.x.c1 for p in pts],
            [p.y.c0 for p in pts],
            [p.y.c1 for p in pts],
            [p.inf for p in pts],
        )

    p, q = dev(pts_a), dev(pts_b)
    neg = jnp.asarray([i % 3 == 0 for i in range(n)], dtype=jnp.int32)

    ops = CJ.FQ2_OPS
    ref_q = CJ.ec_select(ops, neg != 0, CJ.ec_neg(ops, q), q)
    ref = CJ.ec_add(ops, p, ref_q)
    out = PF.ec_add_g2_eager_math(p, q, neg)
    for k in ("x", "y", "z"):
        for c in (0, 1):
            assert (np.asarray(ref[k][c]) == np.asarray(out[k][c])).all(), (k, c)
    # unsigned form
    ref2 = CJ.ec_add(ops, p, q)
    out2 = PF.ec_add_g2_eager_math(p, q, jnp.zeros((n,), jnp.int32))
    for k in ("x", "y", "z"):
        for c in (0, 1):
            assert (np.asarray(ref2[k][c]) == np.asarray(out2[k][c])).all(), (k, c)
