"""Sort-based multi-scalar multiplication: no bucket table, no scatter.

Same role as ops/msm.py (the wasmcurves MSM under snarkjs.groth16.fullProve,
packages/helpers/src/chunked-zkey.ts:76-91), redesigned around the TPU's
measured fast paths (PERF_NOTES.md): ``lax.sort`` at ~14 ms/M keys and
gathers at ~100 GB/s, versus scatter at ~1e7 idx/s and the 2.2 GB
bucket-table copy that XLA re-materializes on every scan step of the
bucket-accumulation design.

Algorithm — per (proof, window) row with signed c-bit digits:

  1. sort the digit magnitudes (descending) with point-index payload, gather
     the points in sorted order, negate where the digit was negative;
  2. the weighted sum  S = sum_j w_j * Q_j  over a *non-increasing* weight
     vector telescopes through K-element blocks:

        S = sum_blocks (intra-block correction) + sum_i wl_i * B_i

     where B_i is the block's plain point sum and wl_i its LAST (smallest)
     weight. The second term is the same problem at 1/K the size — and it is
     ALREADY sorted, so the recursion needs no further sorts or gathers.
  3. intra-block corrections use the threshold identity: for each global
     threshold v in 1..2^(c-1) there is at most one block with
     wl < v <= wf (blocks are globally ordered), and its contribution is the
     intra-block prefix sum of the elements with weight >= v. Boundary
     blocks number at most 2^(c-1) (one per distinct weight transition), so
     the corrections cost one small compaction + NB prefix gathers per level.

Total group work is ~ (1 + 1/K + ...) * rows * n complete EC adds — the
information-theoretic floor for Pippenger bucketing — with zero scatters and
a carry-free dataflow XLA keeps in place. Larger windows (c=13 vs the bucket
path's 8) come for free because there is no 2^c-sized table.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..core import curve_jax as CJ
from ..core import field as F
from ..utils.scan import maybe_scan
from .msm import (
    _concat_pt,
    _concat_pt_list,
    _horner_combine,
    _index_pt,
    _map_coords,
    extract_signed_digits,
)

L = F.LIMBS

C_BITS_SORT = int(os.environ.get("ZKEMAIL_MSM_SORT_C", "13"))


def _batch_ndim(ops, pt) -> int:
    leaf = pt["x"][0] if isinstance(pt["x"], tuple) else pt["x"]
    return leaf.ndim - 1


def _ec_tree_sum(ops, pts):
    """Reduce the LAST batch axis of a point pytree by pairwise EC adds."""
    nb_axis = _batch_ndim(ops, pts) - 1
    leaf = pts["x"][0] if isinstance(pts["x"], tuple) else pts["x"]
    m = leaf.shape[-1]
    while m > 1:
        if m % 2:
            ident = CJ.ec_identity(ops, leaf.shape[1:-1] + (1,))
            pts = _concat_pt(ops, pts, ident, axis=nb_axis)
            m += 1
        half = m // 2
        a = _index_pt(ops, pts, (Ellipsis, slice(0, half)))
        b = _index_pt(ops, pts, (Ellipsis, slice(half, m)))
        pts = CJ.ec_add(ops, a, b)
        m = half
        leaf = pts["x"][0] if isinstance(pts["x"], tuple) else pts["x"]
    return _index_pt(ops, pts, (Ellipsis, 0))


def _level_correction(ops, pr, wq, wf, wl, nb: int, nbb: int):
    """Correction term for one telescoping level: sum over global thresholds
    v of the intra-block prefix at v's (unique) boundary block.

    pr: points reshaped (L, R, nblk, K); wq: weights (R, nblk, K);
    wf/wl: first/last weight per block (R, nblk). Returns point batch (R,).
    """
    R, nblk, K = wq.shape
    flag = (wf != wl).astype(jnp.int32)
    ids = jnp.broadcast_to(jnp.arange(nblk, dtype=jnp.int32)[None], (R, nblk))
    # stable partition: boundary-block ids first, ascending (so compacted
    # slots keep the global descending weight order)
    _, order = jax.lax.sort((1 - flag, ids), dimension=1, num_keys=2)
    order = order[:, :nbb]  # (R, nbb)

    bw = jnp.take_along_axis(wq, order[:, :, None], axis=1)  # (R, nbb, K)
    bpts = _map_coords(
        pr, lambda c: jnp.take_along_axis(c, order[None, :, :, None], axis=2)
    )  # (L, R, nbb, K)

    # materialized intra-block inclusive prefix sums: K unrolled adds (K is
    # small and static; a lax.scan here would materialize a transposed copy)
    acc = CJ.ec_identity(ops, (R, nbb))
    steps = []
    for j in range(K):
        acc = CJ.ec_add(ops, acc, _index_pt(ops, bpts, (Ellipsis, j)))
        steps.append(acc)
    ips = jax.tree_util.tree_map(
        lambda *els: jnp.stack(els, axis=-1).reshape(L, R, nbb * K), *steps
    )

    fl_c = jnp.take_along_axis(flag, order, axis=1)
    wf_c = jnp.where(fl_c == 1, jnp.take_along_axis(wf, order, axis=1), -1)
    wl_c = jnp.where(fl_c == 1, jnp.take_along_axis(wl, order, axis=1), -1)

    v = jnp.arange(1, nb + 1, dtype=jnp.int32)  # (nb,)
    # slot of the block with wl < v <= wf: boundary slots are descending in
    # wf (padding slots pinned to -1 at the tail), so it is the LAST slot
    # with wf >= v when that slot's wl is below v
    asc = wf_c[:, ::-1]
    cnt = nbb - jax.vmap(lambda a: jnp.searchsorted(a, v, side="left"))(asc)
    s_v = jnp.maximum(cnt - 1, 0)  # (R, nb)
    wl_s = jnp.take_along_axis(wl_c, s_v, axis=1)
    wf_s = jnp.take_along_axis(wf_c, s_v, axis=1)
    valid = (cnt > 0) & (wl_s < v[None, :]) & (v[None, :] <= wf_s)

    bw_s = jnp.take_along_axis(bw, s_v[:, :, None], axis=1)  # (R, nb, K)
    c_v = jnp.sum((bw_s >= v[None, :, None]).astype(jnp.int32), axis=2)
    flat_idx = s_v * K + jnp.maximum(c_v - 1, 0)
    q = _map_coords(ips, lambda c: jnp.take_along_axis(c, flat_idx[None], axis=2))
    q = CJ.ec_select(ops, ~valid, CJ.ec_identity(ops, (R, nb)), q)
    return _ec_tree_sum(ops, q)


def _weighted_sorted(ops, pts, w, nb: int, K: int, cutoff: int):
    """sum_j w_j * pts_j per row, for weights w (R, M) sorted non-increasing,
    0 <= w <= nb. pts: point batch (R, M). Returns point batch (R,)."""
    R, M = w.shape
    corr_totals = []
    while M > cutoff:
        nblk = -(-M // K)
        padm = nblk * K - M
        if padm:
            w = jnp.pad(w, ((0, 0), (0, padm)))
            pts = _concat_pt(ops, pts, CJ.ec_identity(ops, (R, padm)), axis=1)
        pr = _map_coords(pts, lambda c: c.reshape(L, R, nblk, K))
        # block sums: K unrolled adds over strided slices — no lax.scan, so
        # the (L, R, M) gathered array is never copied into scan-major order
        # (a multi-GB transpose at CRS scale)
        bsum = CJ.ec_identity(ops, (R, nblk))
        for j in range(K):
            bsum = CJ.ec_add(ops, bsum, _index_pt(ops, pr, (Ellipsis, j)))
        wq = w.reshape(R, nblk, K)
        wf, wl = wq[:, :, 0], wq[:, :, K - 1]
        nbb = min(nb, nblk)
        corr_totals.append(_level_correction(ops, pr, wq, wf, wl, nb, nbb))
        pts, w, M = bsum, wl, nblk

    # final level: direct threshold-prefix evaluation over <= cutoff elements
    elems = _map_coords(pts, lambda c: jnp.moveaxis(c, 2, 0))  # (M, L, R)

    def fp_body(acc, e):
        acc = CJ.ec_add(ops, acc, e)
        return acc, acc

    _, psf = maybe_scan(fp_body, CJ.ec_identity(ops, (R,)), elems)
    psf = _map_coords(psf, lambda c: jnp.moveaxis(c, 0, 2))  # (L, R, M)
    v = jnp.arange(1, nb + 1, dtype=jnp.int32)
    w_asc = w[:, ::-1]
    cnt = M - jax.vmap(lambda a: jnp.searchsorted(a, v, side="left"))(w_asc)
    valid = cnt > 0
    idxs = jnp.maximum(cnt - 1, 0)
    q = _map_coords(psf, lambda c: jnp.take_along_axis(c, idxs[None], axis=2))
    q = CJ.ec_select(ops, ~valid, CJ.ec_identity(ops, (R, nb)), q)
    total = _ec_tree_sum(ops, q)
    for ct in corr_totals:
        total = CJ.ec_add(ops, total, ct)
    return total


def _rows_fn(ops, K: int, cutoff: int, nb: int, points, mag, neg):
    """One row-chunk: sort digits, gather points, telescoped weighted sum.

    points: shared point batch (n,); mag/neg: (R, n) uint8 digit rows.
    Returns per-row partial sums, point batch (R,)."""
    R, n = mag.shape
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (R, n))
    key = -mag.astype(jnp.int32)
    skey, sidx, sneg = jax.lax.sort(
        (key, idx, neg.astype(jnp.int32)), dimension=1, num_keys=1
    )
    w_sorted = -skey
    gathered = _map_coords(points, lambda c: c[:, sidx])  # (L, R, n)
    signed = CJ.ec_select(ops, sneg == 1, CJ.ec_neg(ops, gathered), gathered)
    return _weighted_sorted(ops, signed, w_sorted, nb, K, cutoff)


def _ops_by_name(name: str):
    return CJ.FQ_OPS if name == "fq" else CJ.FQ2_OPS


@functools.lru_cache(maxsize=None)
def _rows_jitted(ops_name: str, K: int, cutoff: int, nb: int):
    ops = _ops_by_name(ops_name)

    def f(points, mag, neg):
        return _rows_fn(ops, K, cutoff, nb, points, mag, neg)

    return jax.jit(f)


def msm_sorted(
    ops,
    points,
    scalars: jnp.ndarray,
    c_bits: int = 0,
    k_block: int = 16,
    row_chunk: int = 0,
    cutoff: int = 0,
    progress=None,
):
    """Batched MSM with shared bases via the sort/telescope pipeline.

    Same contract as ops.msm.msm_multi: scalars (L, B, n) standard-form Fr
    limbs, points a projective pytree with batch (n,); returns point batch
    (B,). Dispatched as a sequence of row-chunk programs (each seconds-long —
    inside the TPU worker's per-program watchdog)."""
    c_bits = c_bits or C_BITS_SORT
    if scalars.ndim != 3 or scalars.shape[0] != L:
        raise ValueError(
            f"msm_sorted expects scalars shaped (L={L}, B, n); got {scalars.shape}"
        )
    _, bsz, n = scalars.shape
    n_points = jax.tree_util.tree_leaves(points)[0].shape[1]
    if n != n_points:
        raise ValueError(
            f"msm_sorted: scalars last axis ({n}) must equal point count "
            f"({n_points}); batch axis goes second"
        )
    n_windows = -(-254 // c_bits)
    nb = 1 << (c_bits - 1)
    cutoff = cutoff or min(nb, 256)

    mag, neg = extract_signed_digits(scalars.reshape(L, bsz * n), c_bits, n_windows)
    w_eff = bsz * n_windows
    mag = mag.reshape(n_windows, bsz, n).transpose(1, 0, 2).reshape(w_eff, n)
    neg = neg.reshape(n_windows, bsz, n).transpose(1, 0, 2).reshape(w_eff, n)

    R = row_chunk or int(
        os.environ.get("ZKEMAIL_MSM_ROWS", "4" if ops.name == "fq2" else "8")
    )
    R = min(R, w_eff)
    rows_pad = -(-w_eff // R) * R
    if rows_pad != w_eff:
        mag = jnp.pad(mag, ((0, rows_pad - w_eff), (0, 0)))
        neg = jnp.pad(neg, ((0, rows_pad - w_eff), (0, 0)))

    on_accel = jax.default_backend() != "cpu"
    fn = (
        _rows_jitted(ops.name, k_block, cutoff, nb)
        if on_accel
        else functools.partial(_rows_fn, ops, k_block, cutoff, nb)
    )
    outs = []
    n_calls = rows_pad // R
    for ci in range(n_calls):
        out = fn(points, mag[ci * R : (ci + 1) * R], neg[ci * R : (ci + 1) * R])
        if progress is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            progress(f"msm rows {ci + 1}/{n_calls}")
        outs.append(out)
    total = outs[0] if len(outs) == 1 else _concat_pt_list(outs)
    if rows_pad != w_eff:
        total = _index_pt(ops, total, (slice(0, w_eff),))
    total = _map_coords(total, lambda c: c.reshape(L, bsz, n_windows))
    return _horner_combine(ops, total, n_windows, c_bits)
