"""Device-mesh parallelism for the proving stack.

The reference has no distributed backend (SURVEY §2.6); scaling here is a
TPU-native design obligation:

  * axis "dp": data-parallel over independent emails — witness generation and
    whole proofs shard trivially (the dominant win; BASELINE config #5).
  * axis "msm": intra-proof parallelism — MSM points shard across chips;
    each chip runs a complete sort/telescope MSM over its local slice
    (ops/msm_sort.py), partial sums are combined with an all_gather + local
    EC tree-reduce (EC addition is not a psum-able monoid, so
    gather-then-reduce rides ICI once instead of log-p hops).
  * NTT sharding: the h polynomial's iNTT/shift/NTT pipeline shards over
    "msm" via a four-step decomposition (sharded_h_eval below) — one
    all_gather over ICI per NTT, local radix-2 stages otherwise.
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


def sharded_sort_msm(
    mesh: Mesh, ops, points, scalars, c_bits: int = 8, row_chunk: int = 0,
    tail: bool = True, k_block: int = 16,
):
    """msm-axis-sharded sort/telescope MSM — the production sharded prove
    path's per-shard design (prover.groth16._msm_stage_sharded_fn uses
    ops.msm_sort.msm_sorted_traced per shard): each shard runs the full
    sort/telescope pipeline over its local point slice, the per-shard
    partial sums are all_gathered over "msm" and tree-reduced with exact EC
    adds (EC addition is associative, so the result is shard-count
    invariant). points (n,), scalars (L, B, n) with n divisible by the msm
    shard count; returns a replicated point batch (B,) — or, with
    tail=False, the per-window partial sums (B, n_windows) for callers that
    fold the Horner combine outside the jit (compile-budget-bound users
    like the multichip dryrun)."""
    from ..ops.msm_sort import msm_sorted_traced

    def local_part(pts, sc):
        part = msm_sorted_traced(
            ops, pts, sc, c_bits=c_bits, k_block=k_block,
            row_chunk=row_chunk, tail=tail,
        )
        g = jax.tree_util.tree_map(
            lambda c: jax.lax.all_gather(c, "msm", axis=0), part
        )
        S = mesh.shape["msm"]
        acc = MSM._map_coords(g, lambda c: c[0])
        for i in range(1, S):
            acc = CJ.ec_add(ops, acc, MSM._map_coords(g, lambda c, i=i: c[i]))
        return acc

    pt_spec = jax.tree_util.tree_map(lambda _: P(None, "msm"), points)
    out_spec = jax.tree_util.tree_map(lambda _: P(), points)
    fn = jax.shard_map(
        local_part,
        mesh=mesh,
        in_specs=(pt_spec, P(None, None, "msm")),
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


# ---------------------------------------------------------------------------
# msm-axis-sharded NTT (four-step decomposition, SURVEY §5.8(b))
# ---------------------------------------------------------------------------
#
# A length-m NTT across S = mesh.shape["msm"] shards as
#   NTT_m = (cross-shard DFT_S) . (rank-local twiddle) . (local NTT_{m/S}),
# the classic four-step split: with i = i1*m2 + i2 (block input, shard s
# holds row i1 = s) and k = k1 + S*k2 (cyclic output, shard s holds k1 = s),
#   X_{k1+S k2} = sum_{i2} w^{i2 k1} w_{m2}^{i2 k2} [ sum_{i1} w_S^{i1 k1} x_{i1,i2} ].
# The inner S-point DFT is ONE all_gather over "msm" + an S-term weighted
# sum (S <= 8 on realistic meshes, so the direct form beats log-S butterfly
# rounds in simplicity at the same asymptotic volume); the rest is local.
# The inverse runs the same split with w -> w^-1 and 1/m split as
# (1/m2 inside the local iNTT) * (1/S folded into the cross twiddles).
#
# Composition used by the prover's h stage (compute_h):
#   block coeffs --iNTT--> cyclic --sigma-scale--> --NTT--> block evals,
# so the h evaluations land block-distributed along "msm", exactly the
# partition _shard_crs gives the h_query points.

def shard_ntt_tables(log_m: int, n_shards: int) -> dict:
    """Host-precomputed twiddle tables for the sharded NTT/iNTT + shift.

    Returns limb arrays (Montgomery form):
      cross_fwd/cross_inv: (S, S, L)    w_S^{+-i1*k1}  (inv includes 1/S)
      local_fwd/local_inv: (S, m2, L)   w^{+-a*b} for (shard, local index)
      shift_cyclic:        (S, m2, L)   sigma^{k1 + S*k2} (CircomReduction)
    """
    from ..core import field as F
    from ..core import limbs as LB

    P = F.R
    m = 1 << log_m
    S = n_shards
    m2 = m // S
    w = F.fr_nth_root(log_m)
    w_inv = pow(w, P - 2, P)
    w_s = pow(w, m2, P)
    w_s_inv = pow(w_s, P - 2, P)
    s_inv = pow(S, P - 2, P)
    sigma = F.fr_nth_root(log_m + 1)

    def limbs(vals):
        arr = np.array([F.FR.to_mont(v % P) for v in vals], dtype=object)
        return np.moveaxis(LB.ints_to_limbs(arr), 0, -1)  # (..., L)

    cross_fwd = limbs(
        [pow(w_s, i1 * k1, P) for k1 in range(S) for i1 in range(S)]
    ).reshape(S, S, -1)
    cross_inv = limbs(
        [pow(w_s_inv, i1 * k1, P) * s_inv % P for k1 in range(S) for i1 in range(S)]
    ).reshape(S, S, -1)
    local_fwd = limbs(
        [pow(w, a * b, P) for a in range(S) for b in range(m2)]
    ).reshape(S, m2, -1)
    local_inv = limbs(
        [pow(w_inv, a * b, P) for a in range(S) for b in range(m2)]
    ).reshape(S, m2, -1)
    shift_cyclic = limbs(
        [pow(sigma, k1 + S * k2, P) for k1 in range(S) for k2 in range(m2)]
    ).reshape(S, m2, -1)
    return {
        "cross_fwd": cross_fwd,
        "cross_inv": cross_inv,
        "local_fwd": local_fwd,
        "local_inv": local_inv,
        "shift_cyclic": shift_cyclic,
    }


def _cross_dft(x_loc, tw_own, axis_name: str):
    """S-point DFT along the shard axis: all_gather + weighted sum.

    x_loc: (L, m2, ...) local block; tw_own: (S, L) this shard's output
    twiddle row w_S^{i1*k1} (k1 = own index). Returns (L, m2, ...).
    """
    from ..core import limbs as LB

    g = jax.lax.all_gather(x_loc, axis_name, axis=0)  # (S, L, m2, ...)
    S = g.shape[0]
    acc = None
    for i1 in range(S):
        tw = tw_own[i1].reshape((-1,) + (1,) * (g.ndim - 2))
        term = LB.mont_mul(LB.FR_SPEC, g[i1], jnp.broadcast_to(tw, g[i1].shape))
        acc = term if acc is None else LB.add(LB.FR_SPEC, acc, term)
    return acc


def _local_mul(x_loc, table_own):
    """Pointwise multiply by this shard's (m2, L) twiddle table."""
    from ..core import limbs as LB

    tw = jnp.moveaxis(table_own, -1, 0)  # (L, m2)
    tw = tw.reshape(tw.shape + (1,) * (x_loc.ndim - 2))
    return LB.mont_mul(LB.FR_SPEC, x_loc, jnp.broadcast_to(tw, x_loc.shape))


def intt_block_to_cyclic(x_loc, tables_own, plan_local, axis_name: str = "msm"):
    """Inverse NTT: block-distributed values -> cyclically-distributed
    coefficients (coefficient k1 + S*k2 on shard k1). Runs inside shard_map."""
    from ..ops import ntt as NTT

    y = _cross_dft(x_loc, tables_own["cross_inv"], axis_name)
    y = _local_mul(y, tables_own["local_inv"])
    return NTT.ntt(y, inverse=True, plan=plan_local)


def ntt_cyclic_to_block(x_loc, tables_own, plan_local, axis_name: str = "msm"):
    """Forward NTT: cyclic coefficients -> block-distributed evaluations.
    The mirror decomposition (local NTT first, then twiddle, then cross
    DFT), so it consumes exactly what intt_block_to_cyclic produces."""
    from ..ops import ntt as NTT

    y = NTT.ntt(x_loc, inverse=False, plan=plan_local)
    y = _local_mul(y, tables_own["local_fwd"])
    return _cross_dft(y, tables_own["cross_fwd"], axis_name)


def shift_scale_cyclic(x_loc, tables_own):
    """sigma^index scale on cyclically-distributed coefficients (the
    CircomReduction domain shift, prover/groth16.compute_h)."""
    return _local_mul(x_loc, tables_own["shift_cyclic"])


def sharded_h_eval(mesh: Mesh, values: jnp.ndarray, log_m: int):
    """values (L, m, B) block-sharded over "msm" -> evaluations of its
    interpolant on sigma*D, same distribution. The single-polynomial core
    of the msm-sharded h stage: iNTT -> sigma-shift -> NTT with two
    all_gathers over ICI; bit-identical to the unsharded
    NTT.shifted_ntt(NTT.ntt(values, inverse=True)) for every shard count."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from ..ops import ntt as NTT

    S = mesh.shape["msm"]
    m = values.shape[1]
    assert m == 1 << log_m and m % S == 0
    tables = {
        k: jnp.asarray(v) for k, v in shard_ntt_tables(log_m, S).items()
    }
    plan_local = {
        k: (
            tuple(jnp.asarray(x) for x in v)
            if isinstance(v, tuple)
            else jnp.asarray(v)
        )
        for k, v in NTT.domain_plan(log_m - S.bit_length() + 1).items()
    }

    def f(x_loc, tabs, plan):
        own = {k: v[0] for k, v in tabs.items()}
        c = intt_block_to_cyclic(x_loc, own, plan)
        c = shift_scale_cyclic(c, own)
        return ntt_cyclic_to_block(c, own, plan)

    tab_specs = {
        "cross_fwd": P("msm", None, None),
        "cross_inv": P("msm", None, None),
        "local_fwd": P("msm", None, None),
        "local_inv": P("msm", None, None),
        "shift_cyclic": P("msm", None, None),
    }
    plan_spec = jax.tree_util.tree_map(lambda _: P(), plan_local)
    fn = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(None, "msm", None), tab_specs, plan_spec),
        out_specs=P(None, "msm", None),
        check_vma=False,
    )
    values = jax.device_put(values, NamedSharding(mesh, P(None, "msm", None)))
    # jit OVER the shard_map: eager shard_map re-traces per call and XLA:CPU
    # compiles the un-jitted form far slower than the jitted one
    return jax.jit(fn)(values, tables, plan_local)
