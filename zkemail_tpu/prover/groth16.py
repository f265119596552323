"""Groth16 prover: witness -> proof, on the JAX/TPU compute path.

Pipeline (replacing snarkjs.groth16.fullProve, chunked-zkey.ts:76-91):
  1. sparse QAP matvecs Aw/Bw (gather + mont-mul + lazy scatter-add) with
     the standard instance rows appended; Cw = Aw∘Bw rowwise,
  2. h evaluations on the shifted domain sigma*D — the snarkjs /
     CircomReduction basis (iNTT -> sigma-shift -> NTT -> a*b - c),
  3. five Pippenger MSMs over the CRS queries (ops/msm.py),
  4. host-side final assembly (r/s randomization) + oracle verification
     against core/curve pairing.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import curve_jax as CJ
from ..core import field as F
from ..core import limbs as LB
from ..core.curve import G1, G2
from ..ops import ntt as NTT
from ..ops.msm import msm, msm_multi
from .containers import Proof
from .setup import ProvingKey

P = F.R
FS = LB.FR_SPEC
L = F.LIMBS


def _matrix_pack(cc, which: str):
    """Device arrays for one R1CS matrix: (rows, cols, mont coeff limbs)."""
    cache = getattr(cc, "_dev_mats", None)
    if cache is None:
        cache = {}
        cc._dev_mats = cache
    if which not in cache:
        rows, cols, cfs = getattr(cc, which)
        coeff_m = LB.ints_to_limbs(
            np.array([F.FR.to_mont(int(c)) for c in cfs], dtype=object)
        )
        cache[which] = (
            jnp.asarray(rows.astype(np.int32)),
            jnp.asarray(cols.astype(np.int32)),
            jnp.asarray(coeff_m),
        )
    return cache[which]


def _lazy_reduce_to_mont(t: jnp.ndarray) -> jnp.ndarray:
    """(L, m) limbs with values up to ~2^23 per limb -> canonical mont form."""
    # carry propagate
    outs = []
    carry = jnp.zeros_like(t[0])
    for i in range(L):
        v = t[i] + carry
        outs.append(v & F.LIMB_MASK)
        carry = v >> F.LIMB_BITS
    x = jnp.stack(outs, axis=0)
    # x < 2^264 and already mont-form (sum of mont products); mont_mul(x, R)
    # = x*R*R^-1 = x mod p — canonical reduction preserving the mont domain
    r1 = jnp.asarray(FS.np_r).reshape((L,) + (1,) * (x.ndim - 1))
    return LB.mont_mul(FS, x, jnp.broadcast_to(r1, x.shape))


def qap_matvec(mat, w_mont: jnp.ndarray, m: int) -> jnp.ndarray:
    """(Mw) per-constraint dot products for one packed matrix (rows, cols,
    coeff limbs), padded to domain size m; mont form.

    w_mont may carry trailing batch axes (L, n_signals, ...); the gather,
    mont-mul, and scatter-add all vectorize over them.
    """
    rows, cols, coeffs = mat
    gathered = w_mont[:, cols]  # (L, nnz, ...)
    coeffs = coeffs.reshape(coeffs.shape + (1,) * (w_mont.ndim - 2))
    prods = LB.mont_mul(FS, gathered, coeffs)
    acc = jnp.zeros((L, m) + prods.shape[2:], dtype=jnp.int32)
    acc = acc.at[:, rows].add(prods)
    return _lazy_reduce_to_mont(acc)


def qap_vector(cc, which: str, w_mont: jnp.ndarray, m: int) -> jnp.ndarray:
    """Eager/test convenience wrapper over qap_matvec (matrix from cc)."""
    return qap_matvec(_matrix_pack(cc, which), w_mont, m)


def compute_h(
    mats, w_mont: jnp.ndarray, log_m: int, plan=None,
    *, n_constraints: int, n_public: int,
) -> jnp.ndarray:
    """h evaluations on the shifted domain sigma*D (mont form, length m).

    The snarkjs / ark-circom CircomReduction witness map
    (rust-verifier/src/verifier_utils.rs:20-23): evaluate A·w, B·w on D with
    the nPublic+1 instance rows appended at nC.., interpolate, re-evaluate on
    sigma*D (iNTT + sigma-power scale + NTT), and return a*b - c there.
    Division by the vanishing polynomial is NOT performed — Z is the
    constant -2 on sigma*D and the CRS h_query basis absorbs it
    (setup.groth16_setup). One NTT pass and the whole C matvec cheaper than
    the classic coset route: C·w on D equals (A·w)∘(B·w) rowwise for a
    satisfied witness, instance rows included (B is zero there).

    mats: {"A"/"B": (rows, cols, coeff_limbs)} — passed as jit ARGUMENTS,
    never closed over: inlining ~nnz-sized constants into the HLO overflows
    the tunneled TPU compile endpoint (HTTP 413). Same for `plan`
    (NTT.domain_plan) carrying the twiddle tables.
    """
    m = 1 << log_m
    aw = qap_matvec(mats["A"], w_mont, m)
    bw = qap_matvec(mats["B"], w_mont, m)
    # instance rows: row nC+s carries public signal s (A side only). SET, not
    # add — imported snarkjs zkeys whose coeff section already materializes
    # these rows then overwrite with the identical value instead of doubling.
    npub1 = n_public + 1
    aw = aw.at[:, n_constraints : n_constraints + npub1].set(w_mont[:, :npub1])
    cw = LB.mont_mul(FS, aw, bw)
    a_c = NTT.ntt(aw, inverse=True, plan=plan)
    b_c = NTT.ntt(bw, inverse=True, plan=plan)
    c_c = NTT.ntt(cw, inverse=True, plan=plan)
    a_e = NTT.shifted_ntt(a_c, plan=plan)
    b_e = NTT.shifted_ntt(b_c, plan=plan)
    c_e = NTT.shifted_ntt(c_c, plan=plan)
    ab = LB.mont_mul(FS, a_e, b_e)
    return LB.sub(FS, ab, c_e)


def _to_host_g1(pt) -> G1:
    aff = CJ.ec_to_affine(CJ.FQ_OPS, pt)
    if bool(np.asarray(aff["inf"])):
        return G1.identity()
    return G1(int(CJ.FQ_OPS.to_ints(aff["x"])), int(CJ.FQ_OPS.to_ints(aff["y"])))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _affine5_jitted():
    """Batched affine conversion of the five MSM result points in ONE device
    program. Eager ec_to_affine runs the ~380-multiply inversion chain one
    op at a time — on the tunneled TPU that is ~380 RPC round-trips PER
    point, tens of seconds of pure dispatch latency per prove call."""
    import jax

    def f(a, b2, b1, c, h):
        return (
            CJ.ec_to_affine(CJ.FQ_OPS, a),
            CJ.ec_to_affine(CJ.FQ2_OPS, b2),
            CJ.ec_to_affine(CJ.FQ_OPS, b1),
            CJ.ec_to_affine(CJ.FQ_OPS, c),
            CJ.ec_to_affine(CJ.FQ_OPS, h),
        )

    return jax.jit(f)


def _results_to_host(a_dev, b2_dev, b1_dev, c_dev, h_dev, bsz: int):
    """(a, b2, b1, c, h) device point batches (B,) -> host point lists."""
    import jax

    if jax.default_backend() == "cpu":
        affs = (
            CJ.ec_to_affine(CJ.FQ_OPS, a_dev),
            CJ.ec_to_affine(CJ.FQ2_OPS, b2_dev),
            CJ.ec_to_affine(CJ.FQ_OPS, b1_dev),
            CJ.ec_to_affine(CJ.FQ_OPS, c_dev),
            CJ.ec_to_affine(CJ.FQ_OPS, h_dev),
        )
    else:
        affs = _affine5_jitted()(a_dev, b2_dev, b1_dev, c_dev, h_dev)

    from ..core.towers import Fq2

    def g1_list(aff):
        xs = CJ.FQ_OPS.to_ints(np.asarray(aff["x"]))
        ys = CJ.FQ_OPS.to_ints(np.asarray(aff["y"]))
        infs = np.asarray(aff["inf"])
        return [
            G1.identity() if infs[i] else G1(int(xs[i]), int(ys[i]))
            for i in range(bsz)
        ]

    def g2_list(aff):
        x0 = CJ.FQ_OPS.to_ints(np.asarray(aff["x"][0]))
        x1 = CJ.FQ_OPS.to_ints(np.asarray(aff["x"][1]))
        y0 = CJ.FQ_OPS.to_ints(np.asarray(aff["y"][0]))
        y1 = CJ.FQ_OPS.to_ints(np.asarray(aff["y"][1]))
        infs = np.asarray(aff["inf"])
        return [
            G2.identity()
            if infs[i]
            else G2(Fq2(int(x0[i]), int(x1[i])), Fq2(int(y0[i]), int(y1[i])))
            for i in range(bsz)
        ]

    return (
        g1_list(affs[0]),
        g2_list(affs[1]),
        g1_list(affs[2]),
        g1_list(affs[3]),
        g1_list(affs[4]),
    )


def _to_host_g2(pt) -> G2:
    from ..core.towers import Fq2

    aff = CJ.ec_to_affine(CJ.FQ2_OPS, pt)
    if bool(np.asarray(aff["inf"])):
        return G2.identity()
    fq = CJ.FQ_OPS
    return G2(
        Fq2(int(fq.to_ints(aff["x"][0])), int(fq.to_ints(aff["x"][1]))),
        Fq2(int(fq.to_ints(aff["y"][0])), int(fq.to_ints(aff["y"][1]))),
    )


def _device_prove_fn(cc, pk):
    """The all-device phase of proving as one (jittable) function.

    All nnz/domain-sized arrays (CRS queries, R1CS matrices, NTT plan) enter
    as function ARGUMENTS — see compute_h docstring."""
    n_priv_offset = pk.n_public + 1

    def f(witness, a_q, b1_q, b2_q, c_q, h_q, mats, plan):
        w_mont = LB.to_mont(FS, witness)
        h_evals = compute_h(
            mats, w_mont, pk.domain_log2, plan,
            n_constraints=pk.n_constraints, n_public=pk.n_public,
        )
        h_std = LB.from_mont(FS, h_evals)
        a_dev = msm(CJ.FQ_OPS, a_q, witness)
        b2_dev = msm(CJ.FQ2_OPS, b2_q, witness)
        b1_dev = msm(CJ.FQ_OPS, b1_q, witness)
        c_dev = msm(CJ.FQ_OPS, c_q, witness[:, n_priv_offset:])
        h_dev = msm(CJ.FQ_OPS, h_q, h_std)
        return a_dev, b2_dev, b1_dev, c_dev, h_dev

    return f


def _prove_consts(cc, pk):
    """Device-resident (mats, plan) argument pytrees, cached on the pk.

    These are ARGUMENTS to the jitted prove fn (not closure constants — see
    compute_h); caching the device_put avoids re-shipping ~100s of MB of
    matrices/twiddles over the (possibly tunneled) link on every prove call.
    """
    cache = getattr(pk, "_const_cache", None)
    if cache is not None and cache[0] is cc:
        return cache[1], cache[2]
    # C is not needed: compute_h derives C·w on D as (A·w)∘(B·w)
    mats = {k: _matrix_pack(cc, k) for k in ("A", "B")}
    plan = {
        k: (
            tuple(jnp.asarray(x) for x in v)
            if isinstance(v, tuple)
            else jnp.asarray(v)
        )
        for k, v in NTT.domain_plan(pk.domain_log2).items()
    }
    pk._const_cache = (cc, mats, plan)
    return mats, plan


def _jit_prove_fn(cc, pk, build, key):
    """Jitted device-prove executable cached ON the ProvingKey.

    The compiled program bakes in cc's R1CS matrices; keying a global cache by
    id() would both collide after GC and pin cc/pk alive forever. Storing the
    executable on pk (keyed by circuit identity + batch shape) bounds its
    lifetime to the ProvingKey that owns the CRS it closes over.
    """
    import jax

    if jax.default_backend() == "cpu":
        return build(cc, pk)
    cache = getattr(pk, "_jit_cache", None)
    if cache is None:
        cache = {}
        pk._jit_cache = cache
    k = key + (id(cc),)
    if k not in cache:
        import jax as _jax

        cache[k] = _jax.jit(build(cc, pk))
    return cache[k]


def _msm_call(pk, kind: str, q, scal, progress=None):
    """One batched MSM, dispatched in bounded device programs on accelerators.

    Default accelerator path is the sort-based MSM (ops/msm_sort.py): no
    bucket table, no scatter — the bucket-scan design spent 60-90% of every
    step copying its 2.2 GB carry table (PERF_NOTES.md). ZKEMAIL_MSM=bucket
    falls back to the chunked bucket scan (ops.msm.msm_multi_chunked), whose
    per-dispatch bounding exists for the same reason the sort path chunks by
    rows: a single monolithic program runs past the TPU worker's per-program
    watchdog and kills the device (the r1/r2 bench "kernel fault")."""
    import jax

    ops = CJ.FQ_OPS if kind == "g1" else CJ.FQ2_OPS
    if jax.default_backend() == "cpu":
        return msm_multi(ops, q, scal)
    if os.environ.get("ZKEMAIL_MSM", "sort") == "bucket":
        from ..ops.msm import msm_multi_chunked

        return msm_multi_chunked(ops, q, scal, progress=progress)
    from ..ops.msm_sort import msm_sorted

    return msm_sorted(ops, q, scal, progress=progress)


def _signal_plan(pk, scalars):
    """Signal-sparsity plan + permuted signal queries, cached on the pk.

    Built from the digits of the first proven batch (ops.msm_sort.
    build_signal_plan); the four signal MSMs (a/b1/b2/c) then run
    window-pruned. The plan is only a performance hint — every batch's
    digits are re-validated on device and _msm_signal_call falls back to
    the dense path (and rebuilds the plan) on a miss, so proofs never
    depend on it. Queries are permuted ONCE on device (a ~100 GB/s gather)
    and cached; the originals stay for the fallback path."""
    import jax

    from ..ops import msm_sort as MS

    cached = getattr(pk, "_sig_plan", None)
    if cached is not None:
        return cached
    perm, prefixes = MS.build_signal_plan(scalars)
    perm_dev = jnp.asarray(perm)
    from ..ops.msm import _map_coords

    pq = {}
    for name, q in (
        ("a", pk.a_query),
        ("b1", pk.b1_query),
        ("b2", pk.b2_query),
        ("c", _c_query_padded(pk)),
    ):
        pq[name] = _map_coords(q, lambda c: jnp.take(c, perm_dev, axis=1))
    jax.block_until_ready(jax.tree_util.tree_leaves(pq)[0])
    pk._sig_plan = (perm, prefixes, pq)
    return pk._sig_plan


def _msm_signal_call(pk, kind: str, qname: str, scal, progress=None):
    """One signal-scalar MSM (a/b1/b2/c): window-pruned when possible.

    ZKEMAIL_MSM_PRUNE=0 disables pruning; non-sort paths and CPU fall
    through to _msm_call unchanged."""
    import jax

    dense_q = {
        "a": lambda: pk.a_query,
        "b1": lambda: pk.b1_query,
        "b2": lambda: pk.b2_query,
        "c": lambda: _c_query_padded(pk),
    }[qname]
    if (
        jax.default_backend() == "cpu"
        or os.environ.get("ZKEMAIL_MSM", "sort") != "sort"
        or os.environ.get("ZKEMAIL_MSM_PRUNE", "1") == "0"
    ):
        return _msm_call(pk, kind, dense_q(), scal, progress)
    from ..ops import msm_sort as MS

    ops = CJ.FQ_OPS if kind == "g1" else CJ.FQ2_OPS
    perm, prefixes, pq = _signal_plan(pk, scal)
    if kind == "g2" and os.environ.get("ZKEMAIL_MSM_G2", "bits") == "bits":
        # bit-serial masked-scan MSM for G2: the Fq2 sort/telescope rows
        # program exceeds the tunnel's compile budget at every width
        # (PERF_NOTES round-5 compile notes); the bit path compiles like
        # any one-scan-body program and the pruned b2 volume is small
        out = MS.msm_bitserial(
            ops, pq[qname], scal, perm, prefixes, progress=progress
        )
    else:
        out = MS.msm_sorted_pruned(
            ops, pq[qname], scal, perm, prefixes, progress=progress
        )
    if out is not None:
        return out
    # plan miss: this batch's digits exceed the cached prefixes (first call
    # after a circuit/witness-distribution change). Prove dense, rebuild.
    if progress is not None:
        progress(f"msm {qname}: signal plan stale; dense fallback + rebuild")
    pk._sig_plan = None
    out = _msm_call(pk, kind, dense_q(), scal, progress)
    _signal_plan(pk, scal)
    return out


def _c_query_padded(pk):
    """c_query front-padded with n_public+1 identity points, cached on pk.

    Lets the c MSM run over the FULL signal vector (public scalar columns
    zeroed) so it shares one compiled program shape with the a/b1 queries —
    zero-magnitude digits never touch the pipeline, so the pad rows are
    dead weight only in the gather."""
    cached = getattr(pk, "_c_query_padded", None)
    if cached is not None:
        return cached
    import jax

    npub1 = pk.n_public + 1
    ident = CJ.ec_identity(CJ.FQ_OPS, (npub1,))
    ident = jax.tree_util.tree_map(
        lambda c, q: jnp.asarray(c, dtype=q.dtype), ident, {k: pk.c_query[k] for k in ident}
    )
    from ..ops.msm import _concat_pt

    padded = _concat_pt(CJ.FQ_OPS, ident, pk.c_query, axis=0)
    dev = jax.tree_util.tree_leaves(pk.c_query)[0].devices()
    if dev:
        padded = jax.device_put(padded, next(iter(dev)))
    pk._c_query_padded = padded
    return padded


def _shard_crs(mesh, pk):
    """Pad + place the five CRS point queries along the mesh's "msm" axis.

    Each query's point count is padded to a multiple of the msm shard count
    with zero coordinates — matching msm's internal padding convention, these
    lanes carry zero scalars and never touch a bucket. Cached on the pk so
    repeated prove calls reuse the placed arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    import jax

    cache = getattr(pk, "_shard_cache", None)
    key = tuple(mesh.devices.flat), tuple(mesh.axis_names)
    if cache is not None and cache[0] == key:
        return cache[1]
    n_msm = mesh.shape["msm"]
    sh = NamedSharding(mesh, PS(None, "msm"))
    out = {}
    for name in ("a_query", "b1_query", "b2_query", "c_query", "h_query"):
        q = getattr(pk, name)
        n = jax.tree_util.tree_leaves(q)[0].shape[1]
        n_pad = -(-n // n_msm) * n_msm
        from ..ops.msm import _map_coords

        if n_pad != n:
            q = _map_coords(q, lambda c: jnp.pad(c, ((0, 0), (0, n_pad - n))))
        q = jax.tree_util.tree_map(lambda c: jax.device_put(c, sh), q)
        out[name] = (q, n_pad)
    pk._shard_cache = (key, out)
    return out


def _shard_local_scalars(scal, n_pad: int, n_msm: int, idx):
    """Scalar slice for msm-shard `idx`: scal (L, B, n_full) zero-padded to
    n_pad, then the idx-th of n_msm equal ranges (matches _shard_crs's point
    padding; the zero-scalar tail never touches a Pippenger bucket)."""
    n_loc = n_pad // n_msm
    pad = n_pad - scal.shape[2]
    if pad:
        scal = jnp.pad(scal, ((0, 0), (0, 0), (0, pad)))
    import jax

    return jax.lax.dynamic_slice_in_dim(scal, idx * n_loc, n_loc, axis=2)


def _msm_stage_sharded_fn(pk, mesh, n_pads):
    """shard_map'd MSM stage over a (dp, msm) mesh: (witness, h) -> 5 points.

    dp shards the proof batch; msm shards the five MSM point sets. Each
    device runs a complete Pippenger MSM over its local point slice (scalars
    dynamic-sliced to the matching range, zero-padded tail), then the
    per-shard partial sums — one projective point per proof — are
    all_gathered over "msm" and tree-reduced with exact EC adds, so the
    result is replicated over msm and sharded over dp. EC addition is
    associative on the group, hence the affine proof points are bit-identical
    for every shard count (SURVEY §4.5).

    The h-polynomial stage runs OUTSIDE this shard_map (GSPMD dp-shards it
    from the witness sharding alone): keeping NTT/QAP out of the manually
    partitioned body keeps the SPMD program small — the all-in-one body sent
    XLA:CPU's algebraic simplifier into a pathological loop and doubled the
    TPU peak memory."""
    import jax
    from jax.sharding import PartitionSpec as PS

    n_priv_offset = pk.n_public + 1
    n_msm = mesh.shape["msm"]

    def _reduce_gathered(ops, part):
        g = jax.tree_util.tree_map(
            lambda c: jax.lax.all_gather(c, "msm", axis=0), part
        )
        acc = jax.tree_util.tree_map(lambda c: c[0], g)
        for i in range(1, n_msm):
            nxt = jax.tree_util.tree_map(lambda c: c[i], g)
            acc = CJ.ec_add(ops, acc, nxt)
        return acc

    # Per-shard local MSM: default is the sort/telescope pipeline (the
    # bucket scan it replaces is 2-3 orders slower at scale, PERF_NOTES.md;
    # VERDICT r4 weak #5). ZKEMAIL_SHARD_MSM=bucket keeps the old path.
    use_sort = os.environ.get("ZKEMAIL_SHARD_MSM", "sort") != "bucket"
    from ..ops.msm_sort import msm_sorted_traced

    def f(w_t, h_t, a_q, b1_q, b2_q, c_q, h_q):
        idx = jax.lax.axis_index("msm")

        def one(ops, q, scal, n_pad):
            local = _shard_local_scalars(scal, n_pad, n_msm, idx)
            if use_sort:
                part = msm_sorted_traced(ops, q, local)
            else:
                part = msm_multi(ops, q, local)
            return _reduce_gathered(ops, part)

        a_dev = one(CJ.FQ_OPS, a_q, w_t, n_pads["a_query"])
        b2_dev = one(CJ.FQ2_OPS, b2_q, w_t, n_pads["b2_query"])
        b1_dev = one(CJ.FQ_OPS, b1_q, w_t, n_pads["b1_query"])
        c_dev = one(CJ.FQ_OPS, c_q, w_t[:, :, n_priv_offset:], n_pads["c_query"])
        h_dev = one(CJ.FQ_OPS, h_q, h_t, n_pads["h_query"])  # h_t: (L, B, m) evals
        return a_dev, b2_dev, b1_dev, c_dev, h_dev

    def pt_spec(q):
        return jax.tree_util.tree_map(lambda _: PS(None, "msm"), q)

    def out_pt_spec(q):
        return jax.tree_util.tree_map(lambda _: PS(None, "dp"), q)

    queries = {
        k: getattr(pk, k)
        for k in ("a_query", "b1_query", "b2_query", "c_query", "h_query")
    }
    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(
            PS(None, "dp", None),
            PS(None, "dp", None),
            pt_spec(queries["a_query"]),
            pt_spec(queries["b1_query"]),
            pt_spec(queries["b2_query"]),
            pt_spec(queries["c_query"]),
            pt_spec(queries["h_query"]),
        ),
        out_specs=(
            out_pt_spec(queries["a_query"]),
            out_pt_spec(queries["b2_query"]),
            out_pt_spec(queries["b1_query"]),
            out_pt_spec(queries["c_query"]),
            out_pt_spec(queries["h_query"]),
        ),
        check_vma=False,
    )


def _h_stage_fn(pk):
    """witness (L, n_signals, B) -> (w_t, h_t) transposed scalar arrays.

    Pure batched math: under jit with a dp-sharded witness, GSPMD partitions
    the whole stage along the batch axis without manual collectives."""

    def f(witness, mats, plan):
        w_mont = LB.to_mont(FS, witness)
        h_evals = compute_h(
            mats, w_mont, pk.domain_log2, plan,
            n_constraints=pk.n_constraints, n_public=pk.n_public,
        )
        h_std = LB.from_mont(FS, h_evals)
        return (
            jnp.moveaxis(witness, 2, 1),
            jnp.moveaxis(h_std, 2, 1),
        )

    return f


def _h_stage_mesh_fn(pk, mesh):
    """The h stage with the NTT pipeline sharded over "msm" (SURVEY §5.8(b)).

    QAP matvecs batch over B (dp-sharded by GSPMD); each polynomial then
    runs the four-step iNTT -> sigma-shift -> NTT of
    parallel/sharding (cross-shard DFT all_gathers over ICI), so a single
    proof's NTT work spreads across the whole mesh instead of replicating
    per dp shard. Output distribution (block over "msm") matches the
    h_query partition of _shard_crs."""
    import jax
    from jax.sharding import PartitionSpec as PS

    from ..parallel.sharding import (
        intt_block_to_cyclic,
        ntt_cyclic_to_block,
        shift_scale_cyclic,
    )

    log_m = pk.domain_log2
    m = 1 << log_m
    npub1 = pk.n_public + 1
    nC = pk.n_constraints

    def f(witness, mats, plan_local, tabs):
        w_mont = LB.to_mont(FS, witness)
        aw = qap_matvec(mats["A"], w_mont, m)
        bw = qap_matvec(mats["B"], w_mont, m)
        aw = aw.at[:, nC : nC + npub1].set(w_mont[:, :npub1])
        cw = LB.mont_mul(FS, aw, bw)

        def pipeline(x_loc, tabs_own, plan2):
            own = {k: v[0] for k, v in tabs_own.items()}
            c = intt_block_to_cyclic(x_loc, own, plan2)
            c = shift_scale_cyclic(c, own)
            return ntt_cyclic_to_block(c, own, plan2)

        tab_specs = {k: PS("msm", None, None) for k in tabs}
        plan_spec = jax.tree_util.tree_map(lambda _: PS(), plan_local)
        sm = jax.shard_map(
            pipeline,
            mesh=mesh,
            in_specs=(PS(None, "msm", "dp"), tab_specs, plan_spec),
            out_specs=PS(None, "msm", "dp"),
            check_vma=False,
        )
        a_e = sm(aw, tabs, plan_local)
        b_e = sm(bw, tabs, plan_local)
        c_e = sm(cw, tabs, plan_local)
        h_evals = LB.sub(FS, LB.mont_mul(FS, a_e, b_e), c_e)
        h_std = LB.from_mont(FS, h_evals)
        return jnp.moveaxis(witness, 2, 1), jnp.moveaxis(h_std, 2, 1)

    return f


def _mesh_ntt_consts(pk, mesh):
    """Device-resident (plan_local, tables) for the msm-sharded h stage."""
    from ..parallel.sharding import shard_ntt_tables

    cache = getattr(pk, "_mesh_ntt_cache", None)
    key = (tuple(mesh.devices.flat), tuple(mesh.axis_names))
    if cache is not None and cache[0] == key:
        return cache[1], cache[2]
    S = mesh.shape["msm"]
    log_m2 = pk.domain_log2 - (S.bit_length() - 1)
    plan_local = {
        k: (
            tuple(jnp.asarray(x) for x in v)
            if isinstance(v, tuple)
            else jnp.asarray(v)
        )
        for k, v in NTT.domain_plan(log_m2).items()
    }
    tables = {
        k: jnp.asarray(v) for k, v in shard_ntt_tables(pk.domain_log2, S).items()
    }
    pk._mesh_ntt_cache = (key, plan_local, tables)
    return plan_local, tables


def _prove_sharded(pk, cc, witnesses, mesh, mats, plan):
    """Dispatch the sharded device phase: place CRS along "msm", witness
    batch along "dp", run the h stage then the shard_map'd MSM stage."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PS

    bsz = witnesses.shape[2]
    dp = mesh.shape["dp"]
    if bsz % dp:
        raise ValueError(f"batch size {bsz} must be divisible by dp={dp}")
    sharded = _shard_crs(mesh, pk)
    n_pads = {k: v[1] for k, v in sharded.items()}
    witnesses = jax.device_put(
        witnesses, NamedSharding(mesh, PS(None, None, "dp"))
    )
    cache = getattr(pk, "_jit_cache", None)
    if cache is None:
        cache = {}
        pk._jit_cache = cache
    on_cpu = jax.default_backend() == "cpu"

    # ZKEMAIL_SHARD_NTT=0 falls back to the dp-replicated h stage
    shard_ntt = os.environ.get("ZKEMAIL_SHARD_NTT", "1") != "0" and mesh.shape["msm"] > 1
    hkey = ("h_stage_mesh" if shard_ntt else "h_stage", bsz,
            tuple(mesh.devices.flat), id(cc))
    if hkey not in cache:
        fn = _h_stage_mesh_fn(pk, mesh) if shard_ntt else _h_stage_fn(pk)
        # CPU (virtual-device test meshes): the PLAIN h stage runs eagerly
        # (XLA:CPU takes minutes to compile the nested field loops), but the
        # mesh variant contains a shard_map whose eager form compiles far
        # slower than its jitted form — always jit it.
        cache[hkey] = fn if (on_cpu and not shard_ntt) else jax.jit(fn)
    if shard_ntt:
        plan_local, tables = _mesh_ntt_consts(pk, mesh)
        w_t, h_t = cache[hkey](witnesses, mats, plan_local, tables)
    else:
        w_t, h_t = cache[hkey](witnesses, mats, plan)

    mkey = ("msm_stage", bsz, tuple(mesh.devices.flat), id(cc))
    if mkey not in cache:
        fn = _msm_stage_sharded_fn(pk, mesh, n_pads)
        # always jit OVER the shard_map: XLA:CPU compiles the jitted form in
        # O(10 min) for toy sizes (gated ZKEMAIL_SLOW_MESH_TESTS coverage),
        # while the eager shard_map form re-traces and ran 40+ min without
        # completing. TPU compiles it in minutes either way.
        cache[mkey] = jax.jit(fn)
    return cache[mkey](
        w_t,
        h_t,
        sharded["a_query"][0],
        sharded["b1_query"][0],
        sharded["b2_query"][0],
        sharded["c_query"][0],
        sharded["h_query"][0],
    )


def prove_batch(
    pk: ProvingKey,
    cc,
    witnesses: jnp.ndarray,
    rng: random.Random | None = None,
    mesh=None,
    timers: dict | None = None,
    progress=None,
) -> list[tuple[Proof, list[int]]]:
    """Prove a batch of witnesses (L, n_signals, B) in one device program.

    Returns a list of (proof, public_inputs), one per batch element. The
    per-proof r/s blinding and final point assembly stay on the host (cheap,
    O(1) EC ops per proof).

    With `mesh` (a (dp, msm) jax.sharding.Mesh, parallel/sharding.make_mesh),
    the batch axis shards over "dp" and the five MSMs over "msm"; proofs are
    bit-identical to the unsharded path for any shard count."""
    rng = rng or random.SystemRandom()
    bsz = witnesses.shape[2]
    mats, plan = _prove_consts(cc, pk)
    if mesh is not None:
        a_dev, b2_dev, b1_dev, c_dev, h_dev = _prove_sharded(
            pk, cc, witnesses, mesh, mats, plan
        )
    else:
        n_priv_offset = pk.n_public + 1
        # The h-stage's NTT/QAP transients scale with its batch axis; at the
        # full-size EmailVerifier (m=2^21) a 4-wide stage peaks several GB
        # over the MSM stage. Chunk the batch through a narrow compiled
        # stage (default 1) and concatenate the (much smaller) outputs.
        # ZKEMAIL_H_CHUNK: emails per compiled h-stage invocation; unset -> 1
        # (lowest HBM peak), 0 -> the whole batch in one stage.
        raw = os.environ.get("ZKEMAIL_H_CHUNK", "1")
        try:
            h_chunk = int(raw)
        except ValueError as exc:
            raise ValueError(
                f"ZKEMAIL_H_CHUNK must be an integer (0 = full batch); got {raw!r}"
            ) from exc
        h_chunk = min(h_chunk, bsz) if h_chunk > 0 else bsz
        if bsz % h_chunk:
            raise ValueError(f"batch {bsz} must be divisible by h_chunk {h_chunk}")
        fn = _jit_prove_fn(
            cc, pk, lambda _cc, _pk: _h_stage_fn(_pk), ("h_stage", h_chunk)
        )
        import time as _time

        def _mark(name, *vals):
            # phase wall-times for the bench detail (SURVEY §5.1): block on
            # the phase's outputs so a later crash report names the program
            # that died and the timings are real, not dispatch latencies
            if timers is not None:
                import jax as _jax

                _jax.block_until_ready(vals)
                now = _time.time()
                timers[name] = round(now - _mark.t0, 3)
                _mark.t0 = now

        _mark.t0 = _time.time()
        w_parts, h_parts = [], []
        for s0 in range(0, bsz, h_chunk):
            wt_i, ht_i = fn(witnesses[:, :, s0 : s0 + h_chunk], mats, plan)
            w_parts.append(wt_i)
            h_parts.append(ht_i)
        w_t = w_parts[0] if len(w_parts) == 1 else jnp.concatenate(w_parts, axis=1)
        h_t = h_parts[0] if len(h_parts) == 1 else jnp.concatenate(h_parts, axis=1)
        del w_parts, h_parts
        _mark("h_stage_s", w_t, h_t)
        # h first: h_t (L, B, m) is the largest scalar array — freeing it
        # before the three n_signals-sized G1/G2 MSMs lowers the HBM peak
        h_dev = _msm_call(pk, "g1", pk.h_query, h_t, progress)
        _mark("msm_h_s", h_dev)
        del h_t
        a_dev = _msm_signal_call(pk, "g1", "a", w_t, progress)
        _mark("msm_a_s", a_dev)
        b2_dev = _msm_signal_call(pk, "g2", "b2", w_t, progress)
        _mark("msm_b2_s", b2_dev)
        b1_dev = _msm_signal_call(pk, "g1", "b1", w_t, progress)
        _mark("msm_b1_s", b1_dev)
        import jax as _jax

        if (
            _jax.default_backend() != "cpu"
            and os.environ.get("ZKEMAIL_MSM", "sort") != "bucket"
        ):
            # full-width c MSM (public scalars zeroed, identity-padded query)
            # so it reuses the a/b1 compiled program — see _c_query_padded
            c_scal = w_t.at[:, :, :n_priv_offset].set(0)
            c_dev = _msm_signal_call(pk, "g1", "c", c_scal, progress)
        else:
            c_dev = _msm_call(pk, "g1", pk.c_query, w_t[:, :, n_priv_offset:], progress)
        _mark("msm_c_s", c_dev)

    out = []
    # slice the public columns on-device BEFORE the host pull: the tunneled
    # d2h link runs ~3 orders of magnitude slower than h2d, so pulling the
    # full (L, n_signals, B) witness to read n_public columns costs minutes
    w_host = np.asarray(witnesses[:, : pk.n_public + 1, :])
    a_l, b2_l, b1_l, c_l, h_l = _results_to_host(
        a_dev, b2_dev, b1_dev, c_dev, h_dev, bsz
    )
    for i in range(bsz):
        r = rng.randrange(P)
        s = rng.randrange(P)
        a_pt = a_l[i].add(pk.alpha_g1).add(pk.delta_g1.mul(r))
        b_pt = b2_l[i].add(pk.beta_g2).add(pk.delta_g2.mul(s))
        b1_pt = b1_l[i].add(pk.beta_g1).add(pk.delta_g1.mul(s))
        c_pt = (
            c_l[i]
            .add(h_l[i])
            .add(a_pt.mul(s))
            .add(b1_pt.mul(r))
            .add(pk.delta_g1.mul((-r * s) % P))
        )
        publics = [
            int(v) for v in LB.limbs_to_ints(w_host[:, 1 : pk.n_public + 1, i])
        ]
        out.append((Proof(a_pt, b_pt, c_pt), publics))
    return out


def prove(
    pk: ProvingKey, cc, witness: jnp.ndarray, rng: random.Random | None = None
) -> tuple[Proof, list[int]]:
    """witness: (L, n_signals) standard-form limb array (single email).

    Returns (proof, public_inputs).
    """
    rng = rng or random.SystemRandom()
    r = rng.randrange(P)
    s = rng.randrange(P)

    fn = _jit_prove_fn(cc, pk, _device_prove_fn, ("prove",))
    mats, plan = _prove_consts(cc, pk)
    a_dev, b2_dev, b1_dev, c_dev, h_dev = fn(
        witness, pk.a_query, pk.b1_query, pk.b2_query, pk.c_query, pk.h_query,
        mats, plan,
    )

    # host assembly with blinding
    a_pt = _to_host_g1(a_dev).add(pk.alpha_g1).add(pk.delta_g1.mul(r))
    b_pt = _to_host_g2(b2_dev).add(pk.beta_g2).add(pk.delta_g2.mul(s))
    b1_pt = _to_host_g1(b1_dev).add(pk.beta_g1).add(pk.delta_g1.mul(s))
    c_pt = (
        _to_host_g1(c_dev)
        .add(_to_host_g1(h_dev))
        .add(a_pt.mul(s))
        .add(b1_pt.mul(r))
        .add(pk.delta_g1.mul((-r * s) % P))
    )

    publics = [
        int(v) for v in LB.limbs_to_ints(np.asarray(witness[:, 1 : pk.n_public + 1]))
    ]
    return Proof(a_pt, b_pt, c_pt), publics
