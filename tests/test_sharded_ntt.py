"""msm-axis-sharded NTT: shard-count invariance on the virtual CPU mesh.

SURVEY §5.8(b): the h polynomial's iNTT -> sigma-shift -> NTT pipeline
sharded over "msm" via the four-step decomposition
(parallel/sharding.sharded_h_eval) must be bit-identical to the unsharded
NTT.shifted_ntt(NTT.ntt(x, inverse=True)) for every shard count.

The full mesh run is @slow (shard_map tracing of the field-op NTT body is a
multi-minute XLA:CPU compile); the table/twiddle math has a fast host-side
check below.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.core import field as F
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.ops import ntt as NTT
from zkemail_tpu.parallel.sharding import (
    make_mesh,
    shard_ntt_tables,
    sharded_h_eval,
)

L = F.LIMBS
P = F.R


def _rand_mont(log_m: int, b: int, seed: int = 1):
    rnd = random.Random(seed)
    m = 1 << log_m
    vals = [rnd.randrange(P) for _ in range(m * b)]
    arr = LB.ints_to_limbs(
        np.array([F.FR.to_mont(int(v)) for v in vals], dtype=object)
    ).reshape(L, m, b)
    return jnp.asarray(arr), vals


def test_shard_ntt_tables_math():
    """Four-step table identities (host ints): cross_fwd/cross_inv are a
    DFT/iDFT pair over the S-th roots, and the sigma table hits the cyclic
    index sigma^(k1 + S*k2)."""
    log_m, S = 6, 4
    m2 = (1 << log_m) // S
    t = shard_ntt_tables(log_m, S)
    w_s = pow(F.fr_nth_root(log_m), m2, P)
    sigma = F.fr_nth_root(log_m + 1)

    def from_mont_entry(a):
        return F.FR.from_mont(int(F.from_limbs([int(x) for x in a])))

    for k1 in range(S):
        for i1 in range(S):
            assert from_mont_entry(t["cross_fwd"][k1, i1]) == pow(w_s, i1 * k1, P)
    # iDFT(DFT) = identity: sum_k cross_inv[j,k]*cross_fwd[k,i] = [i==j]
    for i in range(S):
        for j in range(S):
            acc = sum(
                from_mont_entry(t["cross_inv"][j, k])
                * from_mont_entry(t["cross_fwd"][k, i])
                for k in range(S)
            ) % P
            assert acc == (1 if i == j else 0)
    for k1 in range(S):
        for k2 in range(m2):
            assert from_mont_entry(t["shift_cyclic"][k1, k2]) == pow(
                sigma, k1 + S * k2, P
            )


@pytest.mark.slow
def test_sharded_h_eval_matches_unsharded():
    log_m = 9
    x, _ = _rand_mont(log_m, 2)
    ref = NTT.shifted_ntt(NTT.ntt(x, inverse=True))
    mesh = make_mesh(8, dp=2)  # S = 4 msm shards
    got = jax.block_until_ready(sharded_h_eval(mesh, x, log_m))
    assert (np.asarray(ref) == np.asarray(got)).all()


@pytest.mark.slow
def test_mesh_h_stage_matches_plain():
    """The msm-sharded h stage (groth16._h_stage_mesh_fn — QAP matvecs +
    instance rows + the four-step sharded NTT pipeline) produces the SAME
    (w_t, h_t) as the dp-replicated _h_stage_fn, on a (dp=2, msm=4) mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from zkemail_tpu.circuits.builder import ConstraintSystem
    from zkemail_tpu.prover.groth16 import (
        _h_stage_fn,
        _h_stage_mesh_fn,
        _mesh_ntt_consts,
        _prove_consts,
    )
    from zkemail_tpu.prover.setup import groth16_setup

    cs = ConstraintSystem("htoy")
    x = cs.add_input("x", (4,))
    x2 = cs.mul(x, x)
    y = cs.define(x2[0] + x2[1] + x2[2] + x2[3] + 5)
    cs.mark_public(y)
    cc = cs.compile()
    pk = groth16_setup(cc, seed=3)
    w = cc.eval_witness(
        {"x": jnp.asarray(np.array([[1, 2], [3, 4], [5, 6], [7, 8]], np.int32))}, 2
    )
    mats, plan = _prove_consts(cc, pk)
    w_t0, h_t0 = _h_stage_fn(pk)(w, mats, plan)

    mesh = make_mesh(8, dp=2)
    plan_local, tables = _mesh_ntt_consts(pk, mesh)
    w_sh = jax.device_put(w, NamedSharding(mesh, PS(None, None, "dp")))
    fn = jax.jit(_h_stage_mesh_fn(pk, mesh))
    w_t1, h_t1 = jax.block_until_ready(fn(w_sh, mats, plan_local, tables))
    assert np.array_equal(np.asarray(w_t0), np.asarray(w_t1))
    assert np.array_equal(np.asarray(h_t0), np.asarray(h_t1))
