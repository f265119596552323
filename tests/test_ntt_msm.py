"""NTT and MSM kernels vs Python-int references."""

import random

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.core import curve_jax as CJ
from zkemail_tpu.core import field as F
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.core.curve import G1
from zkemail_tpu.ops import msm as MSM
from zkemail_tpu.ops import ntt as NTT

P = F.R
RNG = random.Random(7)


def to_mont_arr(vals):
    return jnp.asarray(
        LB.ints_to_limbs(np.array([F.FR.to_mont(v % P) for v in vals], dtype=object))
    )


def from_mont_arr(arr):
    ints = LB.limbs_to_ints(np.asarray(arr))
    return [F.FR.from_mont(int(v)) for v in ints]


def naive_ntt(vals, inverse=False):
    n = len(vals)
    log_n = n.bit_length() - 1
    w = F.fr_nth_root(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    out = [sum(vals[j] * pow(w, i * j, P) for j in range(n)) % P for i in range(n)]
    if inverse:
        ninv = pow(n, P - 2, P)
        out = [x * ninv % P for x in out]
    return out


def test_ntt_roundtrip_and_reference():
    n = 16
    vals = [RNG.randrange(P) for _ in range(n)]
    dev = to_mont_arr(vals)
    fwd = NTT.ntt(dev)
    assert from_mont_arr(fwd) == naive_ntt(vals)
    back = NTT.ntt(fwd, inverse=True)
    assert from_mont_arr(back) == vals


def test_coset_roundtrip():
    n = 32
    vals = [RNG.randrange(P) for _ in range(n)]
    dev = to_mont_arr(vals)
    ev = NTT.coset_ntt(dev)
    back = NTT.coset_intt(ev)
    assert from_mont_arr(back) == vals


def test_polynomial_mul_via_coset():
    # (sanity for the h-poly pipeline): eval-multiply-interp == schoolbook
    n = 8
    a = [RNG.randrange(P) for _ in range(n // 2)] + [0] * (n // 2)
    b = [RNG.randrange(P) for _ in range(n // 2)] + [0] * (n // 2)
    ea, eb = NTT.ntt(to_mont_arr(a)), NTT.ntt(to_mont_arr(b))
    prod = LB.mont_mul(LB.FR_SPEC, ea, eb)
    coeffs = from_mont_arr(NTT.ntt(prod, inverse=True))
    expect = [0] * n
    for i, ai in enumerate(a[: n // 2]):
        for j, bj in enumerate(b[: n // 2]):
            expect[(i + j) % n] = (expect[(i + j) % n] + ai * bj) % P
    assert coeffs == expect


def test_msm_small():
    n = 23
    g = G1.generator()
    base_pts = [g.mul(RNG.randrange(1, 1000)) for _ in range(n)]
    scalars = [RNG.randrange(P) for _ in range(n)]
    scalars[3] = 0
    expect = G1.identity()
    for s, pt in zip(scalars, base_pts):
        expect = expect.add(pt.mul(s))

    pts_dev = MSM.points_from_affine_ints(
        CJ.FQ_OPS,
        [p.x for p in base_pts],
        [p.y for p in base_pts],
    )
    sc_dev = jnp.asarray(LB.ints_to_limbs(np.array(scalars, dtype=object)))
    res = MSM.msm(CJ.FQ_OPS, pts_dev, sc_dev, chunk=4)
    aff = CJ.ec_to_affine(CJ.FQ_OPS, res)
    fq = CJ.FQ_OPS
    if bool(np.asarray(aff["inf"])):
        got = G1.identity()
    else:
        got = G1(int(fq.to_ints(aff["x"])), int(fq.to_ints(aff["y"])))
    assert got == expect


def test_msm_identity_points_and_zero_scalars():
    n = 8
    g = G1.generator()
    pts = [g.mul(i + 1) for i in range(n)]
    scalars = [0] * n
    pts_dev = MSM.points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in pts], [p.y for p in pts]
    )
    sc_dev = jnp.asarray(LB.ints_to_limbs(np.array(scalars, dtype=object)))
    res = MSM.msm(CJ.FQ_OPS, pts_dev, sc_dev, chunk=2)
    assert bool(np.asarray(CJ.ec_is_identity(CJ.FQ_OPS, res)))


def test_ntt_batched_matches_columns():
    """(L, n, B) batched NTT == per-column NTT (the prove_batch DP axis)."""
    n, bsz = 16, 3
    cols = [[RNG.randrange(P) for _ in range(n)] for _ in range(bsz)]
    devs = [to_mont_arr(c) for c in cols]
    batched = jnp.stack(devs, axis=2)  # (L, n, B)
    out = NTT.coset_ntt(batched)
    for b in range(bsz):
        single = NTT.coset_ntt(devs[b])
        assert from_mont_arr(out[:, :, b]) == from_mont_arr(single)
    back = NTT.coset_intt(out)
    for b in range(bsz):
        assert from_mont_arr(back[:, :, b]) == cols[b]


def test_msm_multi_matches_single():
    """Shared-base batched MSM == B independent MSMs."""
    n, bsz = 17, 3
    g = G1.generator()
    base_pts = [g.mul(RNG.randrange(1, 1000)) for _ in range(n)]
    pts_dev = MSM.points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in base_pts], [p.y for p in base_pts]
    )
    scalar_sets = [[RNG.randrange(P) for _ in range(n)] for _ in range(bsz)]
    scalar_sets[1][5] = 0  # exercise skip lanes
    sc = jnp.stack(
        [
            jnp.asarray(LB.ints_to_limbs(np.array(s, dtype=object)))
            for s in scalar_sets
        ],
        axis=1,
    )  # (L, B, n)
    res = MSM.msm_multi(CJ.FQ_OPS, pts_dev, sc, chunk=4)
    fq = CJ.FQ_OPS
    for b in range(bsz):
        expect = G1.identity()
        for s, pt in zip(scalar_sets[b], base_pts):
            expect = expect.add(pt.mul(s))
        aff = CJ.ec_to_affine(CJ.FQ_OPS, {k: (tuple(c[:, b] for c in v) if isinstance(v, tuple) else v[:, b]) for k, v in res.items()})
        if bool(np.asarray(aff["inf"])):
            got = G1.identity()
        else:
            got = G1(int(fq.to_ints(aff["x"])), int(fq.to_ints(aff["y"])))
        assert got == expect, f"batch element {b} mismatch"


def test_msm_multi_chunked_matches_monolithic():
    """Chunked dispatch (bounded device programs, donated bucket table) is
    exactly the monolithic msm_multi: the chunk boundaries only reorder the
    exact EC-group accumulation (ops/msm.msm_multi_chunked — the TPU
    watchdog fix for the r1/r2 bench crash)."""
    import numpy as np

    from zkemail_tpu.core import curve_jax as CJ
    from zkemail_tpu.core import field as F
    from zkemail_tpu.core.curve import G1
    from zkemail_tpu.ops.msm import (
        msm_multi,
        msm_multi_chunked,
        points_from_affine_ints,
    )

    L = F.LIMBS
    n, B = 37, 2
    rng = np.random.default_rng(0)
    g = G1.generator()
    host = [g.mul(i + 1) for i in range(n)]
    pts = points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in host], [p.y for p in host]
    )
    scal = jnp.asarray(rng.integers(0, 4096, size=(L, B, n), dtype=np.int32))
    base = msm_multi(CJ.FQ_OPS, pts, scal, chunk=4)
    # 16-point dispatches + a padded tail; different thread partition too
    got = msm_multi_chunked(CJ.FQ_OPS, pts, scal, points_per_call=16, chunk=4)
    base_a = CJ.ec_to_affine(CJ.FQ_OPS, base)
    got_a = CJ.ec_to_affine(CJ.FQ_OPS, got)
    for k in ("x", "y"):
        assert np.array_equal(np.asarray(base_a[k]), np.asarray(got_a[k]))
