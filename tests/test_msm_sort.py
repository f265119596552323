"""Sort-based MSM (ops/msm_sort.py) vs the bucket-scan msm_multi.

The sort/telescope pipeline is the TPU prove path's default MSM (the role of
wasmcurves MSM under snarkjs.groth16.fullProve, chunked-zkey.ts:76-91); these
tests pin its exact EC-group equality with the bucket-scan design across
window sizes, block sizes, row chunking, G2, and adversarial scalar
distributions (zeros, duplicates/long runs, p-1)."""

import random

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.core import curve_jax as CJ
from zkemail_tpu.core import field as F
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.core.curve import G1, G2
from zkemail_tpu.ops import msm as MSM
from zkemail_tpu.ops.msm_sort import msm_sorted

P = F.R
RNG = random.Random(19)


def affine_eq(ops, a, b):
    aa, bb = CJ.ec_to_affine(ops, a), CJ.ec_to_affine(ops, b)
    return all(
        (np.asarray(aa[k]) == np.asarray(bb[k])).all() for k in ("x", "y", "inf")
    )


def _scal_arr(rows):
    return jnp.asarray(LB.ints_to_limbs(np.array(rows, dtype=object)))


def test_extract_signed_digits_wide_windows():
    """Digit recode must reconstruct the scalar for c > 8 (the uint8 storage
    truncated c>=9 magnitudes until round 4)."""
    for c in (8, 12, 13, 16):
        w = -(-254 // c)
        vals = [RNG.randrange(P) for _ in range(4)] + [0, 1, P - 1]
        sc = _scal_arr(vals)
        mag, neg = MSM.extract_signed_digits(sc, c, w)
        mag = np.asarray(mag).astype(np.int64)
        neg = np.asarray(neg).astype(np.int64)
        d = (1 - 2 * neg) * mag
        for i, v in enumerate(vals):
            rec = sum(int(d[k, i]) << (c * k) for k in range(w))
            assert rec == v, f"c={c} value {i}"


def test_msm_sorted_matches_bucket_g1():
    """Multi-level telescoping (small K/cutoff force >=3 levels) on a scalar
    mix with long equal-digit runs, zeros, and boundary values."""
    n, bsz = 96, 3
    host_pts = [G1.generator().mul(RNG.randrange(1, 10**9)) for _ in range(n - 1)]
    host_pts.append(G1.identity())
    pts = MSM.points_from_affine_ints(
        CJ.FQ_OPS,
        [0 if p.inf else p.x for p in host_pts],
        [1 if p.inf else p.y for p in host_pts],
        [p.inf for p in host_pts],
    )
    rows = []
    for _ in range(bsz):
        row = [RNG.randrange(P) for _ in range(n)]
        row[0], row[1], row[2] = 0, 1, P - 1
        for j in range(20, 50):
            row[j] = row[20]  # duplicates -> long same-digit runs
        rows.append(row)
    scal = _scal_arr(rows)
    base = MSM.msm_multi(CJ.FQ_OPS, pts, scal, chunk=8)
    for c, k, cut, r in [(13, 4, 8, 0), (8, 4, 8, 5)]:
        got = msm_sorted(CJ.FQ_OPS, pts, scal, c_bits=c, k_block=k, cutoff=cut, row_chunk=r)
        assert affine_eq(CJ.FQ_OPS, got, base), f"c={c} K={k}"


def test_msm_sorted_matches_bucket_g2():
    n = 17
    host = [G2.generator().mul(RNG.randrange(1, 10**9)) for _ in range(n)]
    pts = MSM.g2_points_from_affine(
        [p.x.c0 for p in host], [p.x.c1 for p in host],
        [p.y.c0 for p in host], [p.y.c1 for p in host],
    )
    scal = _scal_arr([[RNG.randrange(P) for _ in range(n)] for _ in range(2)])
    base = MSM.msm_multi(CJ.FQ2_OPS, pts, scal, chunk=4)
    got = msm_sorted(CJ.FQ2_OPS, pts, scal, c_bits=13, k_block=4, cutoff=8)
    assert affine_eq(CJ.FQ2_OPS, got, base)


def test_msm_sorted_zero_vector():
    n = 8
    host_pts = [G1.generator().mul(i + 1) for i in range(n)]
    pts = MSM.points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in host_pts], [p.y for p in host_pts]
    )
    scal = _scal_arr([[0] * n])
    got = msm_sorted(CJ.FQ_OPS, pts, scal, c_bits=13, k_block=4, cutoff=4)
    aff = CJ.ec_to_affine(CJ.FQ_OPS, got)
    assert bool(np.asarray(aff["inf"]).all())


def test_msm_sorted_column_slicing_matches():
    """Fixed-width column slicing (the one-compiled-program-per-width path,
    ZKEMAIL_MSM_COLS) == the full-width pipeline == bucket MSM: the sum over
    disjoint column subsets is the same EC group sum, including a final
    short slice that pads with reused (weight-0) points."""
    n, bsz = 96, 2
    host_pts = [G1.generator().mul(RNG.randrange(1, 10**9)) for _ in range(n)]
    pts = MSM.points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in host_pts], [p.y for p in host_pts]
    )
    rows = [[RNG.randrange(P) for _ in range(n)] for _ in range(bsz)]
    rows[0][3] = 0
    scal = _scal_arr(rows)
    base = MSM.msm_multi(CJ.FQ_OPS, pts, scal, chunk=8)
    # 40-wide slices: 96 = 40 + 40 + 16(short tail, padded)
    got = msm_sorted(
        CJ.FQ_OPS, pts, scal, c_bits=13, k_block=4, cutoff=8, col_chunk=40
    )
    assert affine_eq(CJ.FQ_OPS, got, base)
    # slice width >= n degrades to the unsliced path
    got2 = msm_sorted(
        CJ.FQ_OPS, pts, scal, c_bits=13, k_block=4, cutoff=8, col_chunk=96
    )
    assert affine_eq(CJ.FQ_OPS, got2, base)


def test_msm_sorted_pruned_matches_dense():
    """Window-pruned dispatch == bucket MSM on a realistic sparse witness
    mix (mostly bit/byte-range signals, a few full-field), including the
    permuted-query contract, column slicing, and zero signals."""
    from zkemail_tpu.ops.msm_sort import build_signal_plan, msm_sorted_pruned
    from zkemail_tpu.ops.msm import _map_coords

    n, bsz = 96, 2
    host_pts = [G1.generator().mul(RNG.randrange(1, 10**9)) for _ in range(n)]
    pts = MSM.points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in host_pts], [p.y for p in host_pts]
    )
    # witness-like columns: ~85% bits/bytes, some zeros, a few full-field
    cols = []
    for j in range(n):
        r = RNG.random()
        if r < 0.1:
            cols.append(0)
        elif r < 0.8:
            cols.append(RNG.randrange(256))
        elif r < 0.9:
            cols.append(RNG.randrange(1 << 121))
        else:
            cols.append(RNG.randrange(P))
    cols[0], cols[1] = P - 1, 1 << 13  # boundary + exact-window-fill carry
    rows = [cols, [(v * 3) % P if v else 0 for v in cols]]
    scal = _scal_arr(rows)
    base = MSM.msm_multi(CJ.FQ_OPS, pts, scal, chunk=8)

    perm, prefixes = build_signal_plan(scal, c_bits=13)
    assert prefixes[0] <= n and prefixes[-1] < prefixes[0]
    pts_p = _map_coords(pts, lambda c: c[:, jnp.asarray(perm)])
    for col_chunk in (0, 40):
        got = msm_sorted_pruned(
            CJ.FQ_OPS, pts_p, scal, perm, prefixes,
            c_bits=13, k_block=4, col_chunk=col_chunk, row_chunk=8,
        )
        assert got is not None
        assert affine_eq(CJ.FQ_OPS, got, base), f"col_chunk={col_chunk}"


def test_msm_sorted_pruned_detects_stale_plan():
    """A batch whose digits exceed the cached prefixes must be REJECTED
    (None), never silently mis-proved — the soundness contract of the plan."""
    from zkemail_tpu.ops.msm_sort import build_signal_plan, msm_sorted_pruned
    from zkemail_tpu.ops.msm import _map_coords

    n = 16
    host_pts = [G1.generator().mul(i + 1) for i in range(n)]
    pts = MSM.points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in host_pts], [p.y for p in host_pts]
    )
    small = _scal_arr([[RNG.randrange(256) for _ in range(n)]])
    perm, prefixes = build_signal_plan(small, c_bits=13)
    pts_p = _map_coords(pts, lambda c: c[:, jnp.asarray(perm)])
    ok = msm_sorted_pruned(CJ.FQ_OPS, pts_p, small, perm, prefixes, c_bits=13, k_block=4)
    assert ok is not None
    big_rows = [[RNG.randrange(P) for _ in range(n)]]
    big = _scal_arr(big_rows)
    assert msm_sorted_pruned(
        CJ.FQ_OPS, pts_p, big, perm, prefixes, c_bits=13, k_block=4
    ) is None


def test_msm_sorted_pruned_g2():
    from zkemail_tpu.ops.msm_sort import build_signal_plan, msm_sorted_pruned
    from zkemail_tpu.ops.msm import _map_coords

    n = 12
    host = [G2.generator().mul(RNG.randrange(1, 10**9)) for _ in range(n)]
    pts = MSM.g2_points_from_affine(
        [p.x.c0 for p in host], [p.x.c1 for p in host],
        [p.y.c0 for p in host], [p.y.c1 for p in host],
    )
    rows = [[RNG.randrange(256) if j % 3 else RNG.randrange(P) for j in range(n)]
            for _ in range(2)]
    scal = _scal_arr(rows)
    base = MSM.msm_multi(CJ.FQ2_OPS, pts, scal, chunk=4)
    perm, prefixes = build_signal_plan(scal, c_bits=13)
    pts_p = _map_coords(pts, lambda c: c[:, jnp.asarray(perm)])
    got = msm_sorted_pruned(
        CJ.FQ2_OPS, pts_p, scal, perm, prefixes, c_bits=13, k_block=4, row_chunk=8
    )
    assert got is not None
    assert affine_eq(CJ.FQ2_OPS, got, base)


def test_host_tail_g2_matches_device_horner():
    """_host_tail_g2 (the compile-free G2 Horner fold) == _horner_combine
    on random per-window partials, including identity windows."""
    from zkemail_tpu.ops.msm_sort import _host_tail_g2
    from zkemail_tpu.ops.msm import _map_coords

    bsz, n_windows, c = 2, 5, 13
    host = [
        G2.identity() if (i % 7 == 3) else G2.generator().mul(RNG.randrange(1, 10**9))
        for i in range(bsz * n_windows)
    ]
    total = MSM.g2_points_from_affine(
        [0 if p.inf else p.x.c0 for p in host], [0 if p.inf else p.x.c1 for p in host],
        [1 if p.inf else p.y.c0 for p in host], [0 if p.inf else p.y.c1 for p in host],
        infs=[p.inf for p in host],
    )
    got = _host_tail_g2(total, bsz, n_windows, c)
    ref = _map_coords(total, lambda arr: arr.reshape(22, bsz, n_windows))
    from zkemail_tpu.ops.msm import _horner_combine
    want = _horner_combine(CJ.FQ2_OPS, ref, n_windows, c)
    assert affine_eq(CJ.FQ2_OPS, got, want)


def test_msm_bitserial_matches_dense_g1():
    """Bit-serial masked-scan MSM == bucket MSM, planless and with a
    signal plan (permuted bases + per-window prefixes), incl. col slicing."""
    from zkemail_tpu.ops.msm_sort import build_signal_plan, msm_bitserial
    from zkemail_tpu.ops.msm import _map_coords

    n, bsz = 64, 2
    host_pts = [G1.generator().mul(RNG.randrange(1, 10**9)) for _ in range(n)]
    pts = MSM.points_from_affine_ints(
        CJ.FQ_OPS, [p.x for p in host_pts], [p.y for p in host_pts]
    )
    rows = []
    for _ in range(bsz):
        row = [RNG.randrange(256) if j % 4 else RNG.randrange(P) for j in range(n)]
        row[0], row[1] = 0, P - 1
        rows.append(row)
    scal = _scal_arr(rows)
    base = MSM.msm_multi(CJ.FQ_OPS, pts, scal, chunk=8)
    got = msm_bitserial(CJ.FQ_OPS, pts, scal, c_bits=13, k_block=4, col_chunk=32)
    assert affine_eq(CJ.FQ_OPS, got, base)
    perm, prefixes = build_signal_plan(scal, c_bits=13)
    pts_p = _map_coords(pts, lambda c: c[:, jnp.asarray(perm)])
    got2 = msm_bitserial(
        CJ.FQ_OPS, pts_p, scal, perm, prefixes, c_bits=13, k_block=4, col_chunk=32
    )
    assert got2 is not None
    assert affine_eq(CJ.FQ_OPS, got2, base)


def test_msm_bitserial_matches_dense_g2():
    from zkemail_tpu.ops.msm_sort import build_signal_plan, msm_bitserial
    from zkemail_tpu.ops.msm import _map_coords

    n = 16
    host = [G2.generator().mul(RNG.randrange(1, 10**9)) for _ in range(n)]
    pts = MSM.g2_points_from_affine(
        [p.x.c0 for p in host], [p.x.c1 for p in host],
        [p.y.c0 for p in host], [p.y.c1 for p in host],
    )
    rows = [[RNG.randrange(256) if j % 3 else RNG.randrange(P) for j in range(n)]
            for _ in range(2)]
    scal = _scal_arr(rows)
    base = MSM.msm_multi(CJ.FQ2_OPS, pts, scal, chunk=4)
    perm, prefixes = build_signal_plan(scal, c_bits=13)
    pts_p = _map_coords(pts, lambda c: c[:, jnp.asarray(perm)])
    got = msm_bitserial(
        CJ.FQ2_OPS, pts_p, scal, perm, prefixes, c_bits=13, k_block=4
    )
    assert got is not None
    assert affine_eq(CJ.FQ2_OPS, got, base)
    # stale plan -> None
    big = _scal_arr([[RNG.randrange(P) for _ in range(n)] for _ in range(2)])
    small_plan = build_signal_plan(_scal_arr([[1] * n, [2] * n]), c_bits=13)
    assert msm_bitserial(
        CJ.FQ2_OPS, pts_p, big, small_plan[0], small_plan[1],
        c_bits=13, k_block=4,
    ) is None
