"""Device-mesh parallelism for the proving stack.

The reference has no distributed backend (SURVEY §2.6); scaling here is a
TPU-native design obligation:

  * axis "dp": data-parallel over independent emails — witness generation and
    whole proofs shard trivially (the dominant win; BASELINE config #5).
  * axis "msm": intra-proof parallelism — MSM points/threads shard across
    chips; each chip accumulates a private bucket table, tables are combined
    with an all_gather + local EC tree-reduce (EC addition is not a psum-able
    monoid, so gather-then-reduce rides ICI once instead of log-p hops).
  * NTT sharding (butterfly all_to_alls) is staged for a later round; the
    h-polynomial today runs replicated per-dp-shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import curve_jax as CJ
from ..ops import msm as MSM


def make_mesh(n_devices: int | None = None, dp: int | None = None):
    """Build a (dp, msm) mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        # largest power-of-two dp with dp <= msm shard count
        dp = 1
        while dp * 2 <= n and n % (dp * 2) == 0 and dp * 2 <= n // (dp * 2):
            dp *= 2
    msm_size = n // dp
    mesh_devs = np.array(devs[: dp * msm_size]).reshape(dp, msm_size)
    return Mesh(mesh_devs, ("dp", "msm"))


def sharded_msm(mesh: Mesh, ops, points, scalars, c_bits: int = 8, chunk: int = 2):
    """MSM with points sharded over the "msm" axis.

    Each shard runs private bucket accumulation on its point slice, partial
    results are all_gathered and tree-reduced locally (identical on every
    shard).  Returns a replicated projective point.
    """
    n_shards = mesh.shape["msm"]

    def local_part(pts, sc):
        part = MSM.msm(ops, pts, sc, chunk=chunk, c_bits=c_bits)
        # stack coords, all_gather over the msm axis, reduce
        gathered = jax.tree_util.tree_map(
            lambda c: jax.lax.all_gather(c, "msm", axis=0), part
        )
        acc = jax.tree_util.tree_map(lambda c: c[0], gathered)
        for i in range(1, n_shards):
            nxt = jax.tree_util.tree_map(lambda c: c[i], gathered)
            acc = CJ.ec_add(ops, acc, nxt)
        return acc

    pt_spec = jax.tree_util.tree_map(lambda _: P(None, "msm"), points)
    fn = jax.shard_map(
        local_part,
        mesh=mesh,
        in_specs=(pt_spec, P(None, "msm")),
        out_specs=jax.tree_util.tree_map(lambda _: P(), points),
        check_vma=False,
    )
    return fn(points, scalars)


def sharded_bucket_accumulate(
    mesh: Mesh, ops, points, scalars, c_bits: int = 4, chunk: int = 2
):
    """The msm-axis-sharded core of Pippenger: per-shard private bucket
    accumulation + an all_gather of the partial bucket sums over ICI.

    Returns the gathered per-shard window sums (n_shards, windows) — the
    cheap final combine runs outside (eagerly / on host).  Used by the
    multichip dry run where the full in-jit reduction would blow up the CPU
    compile budget.
    """
    n_windows = -(-254 // c_bits)

    def local_part(pts, sc):
        mag, neg = MSM.extract_signed_digits(sc, c_bits, n_windows)
        n_local = sc.shape[1]
        steps = n_local // chunk
        magr = mag.reshape(n_windows, steps, chunk)
        negr = neg.reshape(n_windows, steps, chunk)
        pts_steps = MSM._reshape_points(ops, pts, (steps, chunk))
        buckets = CJ.ec_identity(ops, (n_windows, 1 << (c_bits - 1), chunk))

        def body(bkts, xs):
            mg, ng, pt = xs  # mg/ng uint8 (extract_signed_digits)
            mg = mg.astype(jnp.int32)
            ng = ng.astype(jnp.int32)
            ptw = MSM._broadcast_point(ops, pt, (n_windows, chunk))
            ptw = CJ.ec_select(
                ops, jnp.broadcast_to(ng == 1, (n_windows, chunk)),
                CJ.ec_neg(ops, ptw), ptw,
            )
            bidx = jnp.maximum(mg - 1, 0)
            cur = MSM._gather_buckets(ops, bkts, bidx)
            added = CJ.ec_add(ops, cur, ptw)
            new = CJ.ec_select(ops, mg == 0, cur, added)
            return MSM._scatter_buckets(ops, bkts, bidx, new), None

        pts_scan = MSM._map_coords(pts_steps, lambda c: jnp.moveaxis(c, 1, 0))
        buckets, _ = jax.lax.scan(
            body, buckets, (jnp.moveaxis(magr, 1, 0), jnp.moveaxis(negr, 1, 0), pts_scan)
        )
        return jax.tree_util.tree_map(
            lambda c: jax.lax.all_gather(c, "msm", axis=0), buckets
        )

    pt_spec = jax.tree_util.tree_map(lambda _: P(None, "msm"), points)
    out_spec = jax.tree_util.tree_map(lambda _: P(), points)
    fn = jax.shard_map(
        local_part,
        mesh=mesh,
        in_specs=(pt_spec, P(None, "msm")),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(points, scalars)


def dp_sharded_inputs(mesh: Mesh, inputs: dict) -> dict:
    """Place batched witness inputs with the batch (last) axis on "dp"."""
    out = {}
    for k, v in inputs.items():
        spec = P(*([None] * (v.ndim - 1) + ["dp"]))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
