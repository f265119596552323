"""Pippenger multi-scalar multiplication on TPU.

The heavy half of Groth16 proving (the role wasmcurves MSM plays under
snarkjs.groth16.fullProve, packages/helpers/src/chunked-zkey.ts:76-91),
redesigned for static shapes + VPU lanes:

  * signed 8-bit windows (32 windows, 128 buckets each) — digits extracted
    from the 12-bit limb representation on device;
  * bucket accumulation as a lax.scan over point chunks: T parallel "threads"
    each own a private (windows x buckets) table; every scan step does ONE
    batched complete EC add across (windows * T) lanes — no data-dependent
    branching, identity handled by the complete RCB formulas;
  * tree-reduce over threads, running-sum bucket reduction, Horner combine.

Multi-chip: points/threads shard along T; bucket tables psum-reduce over the
mesh (parallel/sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import curve_jax as CJ
from ..core import field as F
from ..core import limbs as LB
from ..utils.scan import jit_on_accel, maybe_fori, maybe_scan

L = F.LIMBS
C_BITS = 8
N_WINDOWS = 32
N_BUCKETS = 1 << (C_BITS - 1)  # 128 (signed digits, |d| in 1..128)


def extract_signed_digits(
    scalars: jnp.ndarray, c_bits: int = C_BITS, n_windows: int = N_WINDOWS
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, n) standard-form Fr scalars -> signed digit magnitudes and signs.

    Returns (mag, neg): int32 (n_windows, n) with mag in 0..2^(c-1); neg in
    {0,1}. Digit value is (1-2*neg) * mag; mag==0 means skip.
    """
    n = scalars.shape[1]
    half = 1 << (c_bits - 1)
    full = 1 << c_bits
    digits = []
    for w in range(n_windows):
        off = w * c_bits
        limb, sh = divmod(off, F.LIMB_BITS)
        val = scalars[limb] >> sh
        got = F.LIMB_BITS - sh
        while got < c_bits and limb + (got + F.LIMB_BITS - 1) // F.LIMB_BITS < L:
            nxt = limb + 1 + (got - (F.LIMB_BITS - sh)) // F.LIMB_BITS
            val = val | (scalars[nxt] << got)
            got += F.LIMB_BITS
        digits.append(val & (full - 1))
    d = jnp.stack(digits, axis=0)  # (W, n)

    def recode(carry, dw):
        dw = dw + carry
        over = (dw > half).astype(jnp.int32)
        signed = dw - full * over
        return over, signed

    _, signed = jax.lax.scan(recode, jnp.zeros((n,), jnp.int32), d)
    # narrow storage: the full-table layout is (W, B*n) and at CRS scale the
    # int32 version alone cost 1.3 GB of HBM; consumers widen back to int32.
    # mag reaches 2^(c-1), so uint8 only fits through c=8 (uint16 to c=17).
    mag_dtype = jnp.uint8 if c_bits <= 8 else jnp.uint16
    neg = (signed < 0).astype(jnp.uint8)
    mag = jnp.abs(signed).astype(mag_dtype)
    return mag, neg


def _slice_pt(pt, sl):
    """Slice a point pytree along the first batch axis (after limb axis)."""

    def f(coord):
        if isinstance(coord, tuple):
            return tuple(c[(slice(None),) + sl] for c in coord)
        return coord[(slice(None),) + sl]

    return {k: f(v) for k, v in pt.items()}


def msm(
    ops,
    points,
    scalars: jnp.ndarray,
    chunk: int = 0,
    c_bits: int = C_BITS,
    n_windows: int = 0,
):
    """sum_i scalars[i] * points[i].

    ops: CJ.FQ_OPS (G1) or CJ.FQ2_OPS (G2).
    points: projective point pytree with batch shape (n,) — use
            points_from_affine to build it.
    scalars: (L, n) standard-form Fr limb array.
    chunk:  thread count T (0 -> auto).
    Returns a single projective point (batch shape ()).
    """
    n = scalars.shape[1]
    n_windows = n_windows or -(-254 // c_bits)
    n_buckets = 1 << (c_bits - 1)
    t_threads = chunk or max(1, min(512, n // 4 or 1))
    mag, neg = extract_signed_digits(scalars, c_bits, n_windows)
    total = _window_sums(ops, points, mag, neg, t_threads, n_buckets)
    return _horner_combine(ops, total, n_windows, c_bits)


def msm_multi(ops, points, scalars: jnp.ndarray, chunk: int = 0, c_bits: int = C_BITS):
    """Batched MSM with shared bases: scalars (L, B, n) -> point batch (B,).

    The batch dimension rides the window axis: one bucket-accumulation scan
    serves all B scalar vectors over the same point set with lanes
    (B*W, T). Total EC-add work equals B separate MSMs, but the serial
    bucket-reduction / Horner tails are amortized across the batch and the
    whole batch is one jitted program (the DP axis of Groth16 prove —
    BASELINE.json config "64 DKIM proofs").

    Axis convention: scalars is (L, B, n) — limbs first, batch SECOND, point
    index LAST (the transpose of the NTT path's (L, n, B); prove_batch
    moveaxes before calling). Checked here because a silently swapped layout
    reshapes into garbage digits.
    """
    if scalars.ndim != 3 or scalars.shape[0] != L:
        raise ValueError(
            f"msm_multi expects scalars shaped (L={L}, B, n); got {scalars.shape}"
        )
    _, bsz, n = scalars.shape
    n_points = jax.tree_util.tree_leaves(points)[0].shape[1]
    if n != n_points:
        raise ValueError(
            f"msm_multi: scalars last axis ({n}) must equal point count "
            f"({n_points}); batch axis goes second"
        )
    n_windows = -(-254 // c_bits)
    n_buckets = 1 << (c_bits - 1)
    t_threads = chunk or max(1, min(max(1, 512 // bsz), n // 4 or 1))
    mag, neg = extract_signed_digits(
        scalars.reshape(L, bsz * n), c_bits, n_windows
    )
    # (W, B*n) -> (B*W, n): each batch element owns a contiguous window block
    mag = mag.reshape(n_windows, bsz, n).transpose(1, 0, 2).reshape(bsz * n_windows, n)
    neg = neg.reshape(n_windows, bsz, n).transpose(1, 0, 2).reshape(bsz * n_windows, n)
    total = _window_sums(ops, points, mag, neg, t_threads, n_buckets)
    total = _map_coords(total, lambda c: c.reshape((L, bsz, n_windows)))
    return _horner_combine(ops, total, n_windows, c_bits)


def _bucket_accum(ops, buckets, points, mag, neg, t_threads: int):
    """Scan a point slice into an existing bucket table (the Pippenger hot
    loop, isolated so callers can dispatch it in bounded slices).

    buckets: point pytree batch (Weff, NB, T); points batch (n,) with n a
    multiple of t_threads; mag/neg (Weff, n). Returns the updated table.
    """
    n_windows, n = mag.shape
    steps = n // t_threads
    mag = mag.reshape(n_windows, steps, t_threads)
    neg = neg.reshape(n_windows, steps, t_threads)
    pts_steps = _reshape_points(ops, points, (steps, t_threads))

    def scan_body(bkts, xs):
        mg, ng, pt = xs  # mg/ng: (W, T) uint8; pt: batch (T,)
        mg = mg.astype(jnp.int32)
        ng = ng.astype(jnp.int32)
        # broadcast point across windows, negate where needed
        ptw = _broadcast_point(ops, pt, (n_windows, t_threads))
        ptw = CJ.ec_select(ops, jnp.broadcast_to(ng == 1, (n_windows, t_threads)), CJ.ec_neg(ops, ptw), ptw)
        bidx = jnp.maximum(mg - 1, 0)  # (W, T)
        cur = _gather_buckets(ops, bkts, bidx)
        added = CJ.ec_add(ops, cur, ptw)
        keep = mg == 0
        new = CJ.ec_select(ops, keep, cur, added)
        bkts = _scatter_buckets(ops, bkts, bidx, new)
        return bkts, None

    pts_scan = _map_coords(pts_steps, lambda c: jnp.moveaxis(c, 1, 0))  # (steps, L, T)
    buckets, _ = maybe_scan(
        scan_body,
        buckets,
        (jnp.moveaxis(mag, 1, 0), jnp.moveaxis(neg, 1, 0), pts_scan),
    )
    return buckets


def _window_tail(ops, buckets, t_threads: int):
    """Thread tree-reduce + running-sum bucket reduction: the (cheap) tail
    turning a (Weff, NB, T) bucket table into per-window sums (Weff,)."""
    # reduce threads: pairwise tree over T axis (axis index 2 of batch)
    tt = t_threads
    while tt > 1:
        half = tt // 2
        a = _index_pt(ops, buckets, (slice(None), slice(None), slice(0, half)))
        b = _index_pt(ops, buckets, (slice(None), slice(None), slice(half, 2 * half)))
        s = CJ.ec_add(ops, a, b)
        if tt % 2:
            rest = _index_pt(ops, buckets, (slice(None), slice(None), slice(2 * half, tt)))
            s = _concat_pt(ops, s, rest, axis=2)
            tt = half + 1
        else:
            tt = half
        buckets = s
    buckets = _index_pt(ops, buckets, (slice(None), slice(None), 0))  # (W, B)

    # running-sum bucket reduction: S_w = sum_b (b+1) * bucket[b]
    def bucket_body(carry, bkt):
        run, total = carry
        run = CJ.ec_add(ops, run, bkt)
        total = CJ.ec_add(ops, total, run)
        return (run, total), None

    n_windows = jax.tree_util.tree_leaves(buckets)[0].shape[1]
    ident_w = CJ.ec_identity(ops, (n_windows,))
    rev = _reverse_pt_axis(ops, buckets, axis=1)
    (run, total), _ = maybe_scan(
        bucket_body, (ident_w, ident_w), _move_pt_axis(ops, rev, 1, 0)
    )
    return total


def _window_sums(ops, points, mag, neg, t_threads: int, n_buckets: int):
    """Bucket accumulation + thread tree-reduce + running-sum reduction.

    mag/neg: (Weff, n) signed digits over a shared point batch (n,).
    Returns per-window sums: a point with batch shape (Weff,).
    """
    n_windows, n = mag.shape
    n_pad = ((n + t_threads - 1) // t_threads) * t_threads
    pad = n_pad - n
    if pad:
        mag = jnp.pad(mag, ((0, 0), (0, pad)))
        neg = jnp.pad(neg, ((0, 0), (0, pad)))
        points = _pad_points(ops, points, pad)
    buckets = CJ.ec_identity(ops, (n_windows, n_buckets, t_threads))
    buckets = _bucket_accum(ops, buckets, points, mag, neg, t_threads)
    return _window_tail(ops, buckets, t_threads)


def msm_multi_chunked(
    ops,
    points,
    scalars: jnp.ndarray,
    points_per_call: int = 0,
    c_bits: int = C_BITS,
    chunk: int = 0,
    progress=None,
):
    """msm_multi dispatched as a SEQUENCE of bounded device programs.

    One monolithic bucket-accumulation scan over a CRS-sized point set runs
    for minutes and trips the TPU worker's per-program watchdog ("TPU worker
    crashed ... kernel fault" — the round-2 bench failure). Slicing the
    point stream into ~128k-point dispatches bounds each program to seconds;
    the (Weff, NB, T) bucket table is the carry, DONATED between calls so it
    never leaves HBM and is updated in place. Identical results to
    msm_multi (same scan order within a window).
    """
    import os

    if scalars.ndim != 3 or scalars.shape[0] != L:
        raise ValueError(
            f"msm_multi_chunked expects scalars (L={L}, B, n); got {scalars.shape}"
        )
    _, bsz, n = scalars.shape
    n_windows = -(-254 // c_bits)
    n_buckets = 1 << (c_bits - 1)
    # bound the bucket table to ~1.2 GB so the scan (whose XLA schedule can
    # hold ~2 copies of the carry) plus the resident CRS queries stays under
    # the 16 GB HBM: G2 lanes cost 2x the bytes of G1 (Fq2 coordinate
    # pairs), so b2 runs with half the threads of the G1 queries
    bytes_per_lane = 264 * (2 if ops.name == "fq2" else 1)
    t_budget = max(32, int(1.2e9) // (bsz * n_windows * n_buckets * bytes_per_lane))
    t_budget = 1 << (t_budget.bit_length() - 1)  # floor to a power of two
    t_threads = chunk or max(1, min(512, t_budget, n // 4 or 1))
    ppc = points_per_call or int(os.environ.get("ZKEMAIL_MSM_CHUNK", "131072"))
    ppc = max(t_threads, (ppc // t_threads) * t_threads)

    mag, neg = extract_signed_digits(scalars.reshape(L, bsz * n), c_bits, n_windows)
    w_eff = bsz * n_windows
    mag = mag.reshape(n_windows, bsz, n).transpose(1, 0, 2).reshape(w_eff, n)
    neg = neg.reshape(n_windows, bsz, n).transpose(1, 0, 2).reshape(w_eff, n)
    # pad so every dispatch sees the SAME slice shape (one compiled program).
    # Only the digit arrays are padded up front (cheap); the POINT padding is
    # applied to the final slice alone — padding the whole device-resident
    # CRS query would materialize a second full copy (hundreds of MB) right
    # at the HBM peak the chunking exists to avoid.
    n_pad = -(-n // ppc) * ppc
    if n_pad != n:
        mag = jnp.pad(mag, ((0, 0), (0, n_pad - n)))
        neg = jnp.pad(neg, ((0, 0), (0, n_pad - n)))

    on_accel = jax.default_backend() != "cpu"
    accum = (
        _accum_jitted(ops.name, t_threads)
        if on_accel
        else functools.partial(_bucket_accum, ops, t_threads=t_threads)
    )
    buckets = CJ.ec_identity(ops, (w_eff, n_buckets, t_threads))
    n_calls = n_pad // ppc
    for ci in range(n_calls):
        s0, s1 = ci * ppc, (ci + 1) * ppc
        pt_slice = _slice_pt(points, (slice(s0, min(s1, n)),))
        if s1 > n:
            pt_slice = _pad_points(ops, pt_slice, s1 - n)
        buckets = accum(
            buckets,
            pt_slice,
            mag[:, s0:s1],
            neg[:, s0:s1],
        )
        if progress is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(buckets)[0])
            progress(f"msm chunk {ci + 1}/{n_calls}")

    def tail(bkts):
        total = _window_tail(ops, bkts, t_threads)
        total = _map_coords(total, lambda c: c.reshape((L, bsz, n_windows)))
        return _horner_combine(ops, total, n_windows, c_bits)

    return _tail_jitted(ops.name, t_threads, bsz, n_windows, c_bits)(buckets) if on_accel else tail(buckets)


def _ops_by_name(name: str):
    return CJ.FQ_OPS if name == "fq" else CJ.FQ2_OPS


@functools.lru_cache(maxsize=None)
def _accum_jitted(ops_name: str, t_threads: int):
    """One compiled bucket-accumulation program per (group, T) — the bucket
    table (arg 0) is donated so chunked dispatches update it in place."""
    ops = _ops_by_name(ops_name)

    def f(buckets, pts, mag, neg):
        return _bucket_accum(ops, buckets, pts, mag, neg, t_threads)

    return jax.jit(f, donate_argnums=0)


@functools.lru_cache(maxsize=None)
def _tail_jitted(ops_name: str, t_threads: int, bsz: int, n_windows: int, c_bits: int):
    ops = _ops_by_name(ops_name)

    def f(bkts):
        total = _window_tail(ops, bkts, t_threads)
        total = _map_coords(total, lambda c: c.reshape((L, bsz, n_windows)))
        return _horner_combine(ops, total, n_windows, c_bits)

    return jax.jit(f)


def _horner_combine(ops, total, n_windows: int, c_bits: int):
    """res = sum_w 2^(c*w) S_w over the LAST batch axis of `total`.

    total: point with batch shape (..., n_windows) -> batch (...). A scan so
    the traced graph stays one window-body deep; leading batch axes (the
    msm_multi proof batch) ride the lanes of every doubling/add.
    """

    def horner_body(res, s_w):
        # c_bits doublings unrolled at trace time: a lax.fori_loop nested in
        # the window scan sends XLA:CPU's pipeline into a multi-minute stall
        # (the graph is tiny either way; 8 inline doubles compile fast)
        for _ in range(c_bits):
            res = CJ.ec_double(ops, res)
        res = CJ.ec_add(ops, res, s_w)
        return res, None

    res = _index_pt(ops, total, (Ellipsis, n_windows - 1))
    rest = _index_pt(ops, total, (Ellipsis, slice(n_windows - 2, None, -1)))
    rest = _map_coords(rest, lambda c: jnp.moveaxis(c, c.ndim - 1, 0))
    res, _ = maybe_scan(horner_body, res, rest)
    return res


# ---------------------------------------------------------------------------
# point pytree utilities (coords are (L, ...) arrays or tuples of them)
# ---------------------------------------------------------------------------

def _map_coords(pt, f):
    out = {}
    for k, v in pt.items():
        out[k] = tuple(f(c) for c in v) if isinstance(v, tuple) else f(v)
    return out


def _pad_points(ops, pt, pad):
    return _map_coords(pt, lambda c: jnp.pad(c, ((0, 0), (0, pad))))


def _reshape_points(ops, pt, shape):
    return _map_coords(pt, lambda c: c.reshape((L,) + shape))


def _broadcast_point(ops, pt, shape):
    return _map_coords(pt, lambda c: jnp.broadcast_to(c[:, None, ...], (L,) + shape))


def _index_pt(ops, pt, sl):
    if not isinstance(sl, tuple):
        sl = (sl,)
    return _map_coords(pt, lambda c: c[(slice(None),) + sl])


def _concat_pt(ops, a, b, axis):
    return {
        k: (
            tuple(jnp.concatenate([x, y], axis=axis + 1) for x, y in zip(a[k], b[k]))
            if isinstance(a[k], tuple)
            else jnp.concatenate([a[k], b[k]], axis=axis + 1)
        )
        for k in a
    }


def _reverse_pt_axis(ops, pt, axis):
    return _map_coords(pt, lambda c: jnp.flip(c, axis=axis + 1))


def _move_pt_axis(ops, pt, src, dst):
    return _map_coords(pt, lambda c: jnp.moveaxis(c, src + 1, dst))


def _gather_buckets(ops, bkts, bidx):
    """bkts batch (W, NB, T); bidx (W, T) -> batch (W, T)."""

    def g(c):
        # c: (L, W, NB, T)
        return jnp.take_along_axis(c, bidx[None, :, None, :], axis=2)[:, :, 0, :]

    return _map_coords(bkts, g)


def _scatter_buckets(ops, bkts, bidx, new):
    w_idx = jnp.arange(bidx.shape[0])[:, None]
    t_idx = jnp.arange(bidx.shape[1])[None, :]

    def s(c, nc):
        return c.at[:, w_idx, bidx, t_idx].set(nc)

    out = {}
    for k in bkts:
        if isinstance(bkts[k], tuple):
            out[k] = tuple(s(c, nc) for c, nc in zip(bkts[k], new[k]))
        else:
            out[k] = s(bkts[k], new[k])
    return out


# ---------------------------------------------------------------------------
# Fixed-base batched scalar multiplication (setup / CRS generation)
# ---------------------------------------------------------------------------

def extract_digits_unsigned(scalars: jnp.ndarray) -> jnp.ndarray:
    """(L, n) standard Fr limbs -> (N_WINDOWS, n) unsigned 8-bit digits."""
    digits = []
    for w in range(N_WINDOWS):
        off = w * C_BITS
        limb, sh = divmod(off, F.LIMB_BITS)
        val = scalars[limb] >> sh
        if C_BITS - (F.LIMB_BITS - sh) > 0 and limb + 1 < L:
            val = val | (scalars[limb + 1] << (F.LIMB_BITS - sh))
        digits.append(val & ((1 << C_BITS) - 1))
    return jnp.stack(digits, axis=0)


@functools.lru_cache(maxsize=None)
def _fb_table_host(kind: str):
    """(N_WINDOWS, 256) table of base * (d << 8w) as host points."""
    from ..core.curve import G1, G2

    base = G1.generator() if kind == "g1" else G2.generator()
    ident = G1.identity() if kind == "g1" else G2.identity()
    table = []
    step = base
    for w in range(N_WINDOWS):
        row = [ident]
        for d in range(1, 256):
            row.append(row[-1].add(step))
        table.append(row)
        step = row[-1].add(step)  # base * (256 << 8w) = base * (1 << 8(w+1))
    return table


@functools.lru_cache(maxsize=None)
def _fb_table_dev(kind: str):
    table = _fb_table_host(kind)
    flat = [p for row in table for p in row]
    if kind == "g1":
        pts = points_from_affine_ints(
            CJ.FQ_OPS,
            [p.x if not p.inf else 0 for p in flat],
            [p.y if not p.inf else 1 for p in flat],
            [p.inf for p in flat],
        )
    else:
        pts = g2_points_from_affine(
            [0 if p.inf else p.x.c0 for p in flat],
            [0 if p.inf else p.x.c1 for p in flat],
            [1 if p.inf else p.y.c0 for p in flat],
            [0 if p.inf else p.y.c1 for p in flat],
            [p.inf for p in flat],
        )
    return _map_coords(pts, lambda c: c.reshape(L, N_WINDOWS, 256))


def _fb_fold(kind: str, n: int):
    ops = CJ.FQ_OPS if kind == "g1" else CJ.FQ2_OPS

    def fold(digits, table):
        # scan over the 32 windows: ONE ec_add body to compile (32x smaller
        # graph than the unrolled loop — load-bearing on the tunneled TPU
        # where compile latency dominates setup)
        acc = CJ.ec_identity(ops, (n,))
        tab_scan = _map_coords(table, lambda c: jnp.moveaxis(c, 1, 0))  # (W, L, 256)

        def body(a, xs):
            dw, tab_w = xs  # dw: (n,); tab_w coords: (L, 256)
            sel = _map_coords(tab_w, lambda c: c[:, dw])
            return CJ.ec_add(ops, a, sel), None

        acc, _ = maybe_scan(body, acc, (digits, tab_scan))
        return acc

    return fold


# lanes per fold invocation: bounds the fold's HBM temps (an unchunked G2
# fold at 2^21 lanes needs ~20 GB of (L+1)-limb scan temps on a 16 GB v5e)
# and lets every CRS query share ONE compiled fold per group kind.
FB_CHUNK = 1 << 18


def _concat_pt_list(pts: list, axis: int = 0) -> dict:
    out = {}
    for k in pts[0]:
        if isinstance(pts[0][k], tuple):
            out[k] = tuple(
                jnp.concatenate([p[k][i] for p in pts], axis=axis + 1)
                for i in range(len(pts[0][k]))
            )
        else:
            out[k] = jnp.concatenate([p[k] for p in pts], axis=axis + 1)
    return out


def fixed_base_batch(
    kind: str, scalars: list, on_cpu: bool = True, chunk: int = 0
) -> dict:
    """[s_0..s_{n-1}] -> projective points s_i * G  (G1 or G2 generator).

    32 batched complete additions over n lanes (one per window), processed in
    FB_CHUNK-lane slices.  Runs on the host CPU backend by default: CRS
    materialization is one-time (and disk cached), and the eager CPU path
    reuses the small cached kernels instead of paying a tunneled accelerator
    compile.
    """
    n = len(scalars)
    limbs = LB.ints_to_limbs(np.array([s % F.R for s in scalars], dtype=object))
    if on_cpu and jax.default_backend() != "cpu":
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            sc = jnp.asarray(limbs)
            digits = extract_digits_unsigned(sc)
            table = _fb_table_dev_cpu(kind)
            return _fb_fold(kind, n)(digits, table)
    chunk = chunk or FB_CHUNK
    # pad each slice to a shared bucket size so every query of every size
    # reuses one compiled fold (zero scalars fold as identity adds)
    n_pad = 1
    while n_pad < min(n, chunk):
        n_pad *= 2
    table = _fb_table_dev(kind)
    fold = jit_on_accel(_fb_fold(kind, n_pad), key=("fb", kind, n_pad))
    ops = CJ.FQ_OPS if kind == "g1" else CJ.FQ2_OPS
    outs = []
    for start in range(0, n, n_pad):
        sl = limbs[:, start : start + n_pad]
        take = sl.shape[1]
        if take != n_pad:
            sl = np.pad(sl, ((0, 0), (0, n_pad - take)))
        digits = extract_digits_unsigned(jnp.asarray(sl))  # (W, n_pad)
        out = fold(digits, table)
        if take != n_pad:
            out = _index_pt(ops, out, (slice(0, take),))
        out = jax.block_until_ready(out)
        outs.append(out)
    return outs[0] if len(outs) == 1 else _concat_pt_list(outs)


@functools.lru_cache(maxsize=None)
def _fb_table_dev_cpu(kind: str):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        table = _fb_table_host(kind)
        flat = [p for row in table for p in row]
        if kind == "g1":
            pts = points_from_affine_ints(
                CJ.FQ_OPS,
                [p.x if not p.inf else 0 for p in flat],
                [p.y if not p.inf else 1 for p in flat],
                [p.inf for p in flat],
            )
        else:
            pts = g2_points_from_affine(
                [0 if p.inf else p.x.c0 for p in flat],
                [0 if p.inf else p.x.c1 for p in flat],
                [1 if p.inf else p.y.c0 for p in flat],
                [0 if p.inf else p.y.c1 for p in flat],
                [p.inf for p in flat],
            )
        return _map_coords(pts, lambda c: c.reshape(L, N_WINDOWS, 256))


def points_from_affine_ints(ops, xs, ys, infs=None):
    """Host helper: affine integer coordinate arrays -> projective pytree."""
    n = len(xs)
    if ops is CJ.FQ_OPS:
        x = ops.from_ints(xs)
        y = ops.from_ints([1 if (infs and infs[i]) else ys[i] for i in range(n)]) if infs else ops.from_ints(ys)
        z = ops.from_ints([0 if (infs and infs[i]) else 1 for i in range(n)])
        if infs:
            x = jnp.where(jnp.asarray(infs)[None, :], 0, x)
        return {"x": x, "y": y, "z": z}
    raise NotImplementedError("use g2_points_from_affine for G2")


def g2_points_from_affine(xs0, xs1, ys0, ys1, infs=None):
    fq = CJ.FQ_OPS
    n = len(xs0)
    infs = infs or [False] * n
    x0 = fq.from_ints([0 if infs[i] else xs0[i] for i in range(n)])
    x1 = fq.from_ints([0 if infs[i] else xs1[i] for i in range(n)])
    y0 = fq.from_ints([1 if infs[i] else ys0[i] for i in range(n)])
    y1 = fq.from_ints([0 if infs[i] else ys1[i] for i in range(n)])
    z0 = fq.from_ints([0 if infs[i] else 1 for i in range(n)])
    z1 = fq.from_ints([0] * n)
    return {"x": (x0, x1), "y": (y0, y1), "z": (z0, z1)}
