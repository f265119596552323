"""Shard-count invariance of the mesh-integrated prover (SURVEY §4.5).

The reference has no distributed backend (SURVEY §2.6); the TPU design
obligation is that dp/msm sharding is a pure execution-layout choice: with
fixed blinding r/s the proof bytes must be bit-identical at every shard
count.

The msm-shard partition (zero-padded point ranges + per-shard complete MSMs
+ exact EC-add reduction, groth16._shard_local_scalars / _shard_crs) is
verified here for 1/2/4/8 shards by running each simulated shard's MSM
eagerly — XLA:CPU needs tens of minutes to compile msm_multi under SPMD, so
the collective plumbing itself (shard_map + all_gather on the virtual CPU
mesh) is exercised by dryrun_multichip, and the compiled sharded path runs
on real TPU meshes.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.core import curve_jax as CJ
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.ops.msm import _map_coords, msm_multi
from zkemail_tpu.parallel.sharding import make_mesh
from zkemail_tpu.prover.containers import verify
from zkemail_tpu.prover.groth16 import (
    _shard_local_scalars,
    _to_host_g1,
    compute_h,
    _prove_consts,
    prove_batch,
)
from zkemail_tpu.prover.setup import groth16_setup

FS = LB.FR_SPEC


@pytest.fixture(scope="module")
def toy():
    cs = ConstraintSystem("shardtoy")
    x = cs.add_input("x", ())
    x2 = cs.mul(x, x)
    x3 = cs.mul(x2, x)
    y = cs.define(x3 + x + 11)
    cs.mark_public(y)
    cc = cs.compile()
    pk = groth16_setup(cc, seed=5)
    xs = [3, 17, 99, 1234]
    w = cc.eval_witness({"x": jnp.asarray(np.array(xs, dtype=np.int32))}, len(xs))
    return cc, pk, w


def _affine(pt_batch, i):
    one = {
        k: (
            tuple(c[:, i] for c in v)
            if isinstance(v, tuple)
            else v[:, i]
        )
        for k, v in pt_batch.items()
    }
    return _to_host_g1(one)


def test_msm_shard_partition_invariant(toy):
    """Per-shard partial MSMs + EC-add reduction == unsharded MSM, for every
    shard count and every CRS query — hence sharded proofs are bit-identical
    (host assembly is a pure function of these five points and r/s)."""
    cc, pk, w = toy
    mats, plan = _prove_consts(cc, pk)
    w_mont = LB.to_mont(FS, w)
    h_std = LB.from_mont(
        FS,
        compute_h(
            mats, w_mont, pk.domain_log2, plan,
            n_constraints=pk.n_constraints, n_public=pk.n_public,
        ),
    )
    w_t = jnp.moveaxis(w, 2, 1)
    h_t = jnp.moveaxis(h_std, 2, 1)
    n_priv = pk.n_public + 1
    cases = [
        ("a_query", pk.a_query, w_t),
        ("b1_query", pk.b1_query, w_t),
        ("c_query", pk.c_query, w_t[:, :, n_priv:]),
        ("h_query", pk.h_query, h_t),
    ]
    bsz = w.shape[2]
    for name, q, scal in cases:
        base = msm_multi(CJ.FQ_OPS, q, scal)
        base_pts = [_affine(base, i) for i in range(bsz)]
        n = jax.tree_util.tree_leaves(q)[0].shape[1]
        for n_shards in (1, 2, 4, 8):
            n_pad = -(-n // n_shards) * n_shards
            qp = (
                _map_coords(q, lambda c: jnp.pad(c, ((0, 0), (0, n_pad - n))))
                if n_pad != n
                else q
            )
            n_loc = n_pad // n_shards
            acc = None
            for idx in range(n_shards):
                q_loc = _map_coords(qp, lambda c: c[:, idx * n_loc : (idx + 1) * n_loc])
                s_loc = _shard_local_scalars(scal, n_pad, n_shards, idx)
                part = msm_multi(CJ.FQ_OPS, q_loc, s_loc)
                acc = part if acc is None else CJ.ec_add(CJ.FQ_OPS, acc, part)
            got = [_affine(acc, i) for i in range(bsz)]
            assert got == base_pts, f"{name} mismatch at {n_shards} shards"


def test_unsharded_proofs_verify_and_are_deterministic(toy):
    cc, pk, w = toy
    p1 = prove_batch(pk, cc, w, rng=random.Random(42))
    p2 = prove_batch(pk, cc, w, rng=random.Random(42))
    for (a, pa), (b, pb) in zip(p1, p2):
        assert (a.a, a.b, a.c, pa) == (b.a, b.b, b.c, pb)
    for proof, publics in p1:
        assert verify(pk.vk, proof, publics)


def test_sharded_batch_divisibility_error(toy):
    cc, pk, w = toy
    mesh = make_mesh(8, dp=8)
    with pytest.raises(ValueError, match="divisible"):
        prove_batch(pk, cc, w[:, :, :3], rng=random.Random(1), mesh=mesh)


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("ZKEMAIL_SLOW_MESH_TESTS"),
    reason="XLA:CPU compiles the shard_map'd MSM body in O(10 min); "
    "set ZKEMAIL_SLOW_MESH_TESTS=1 to run the composed mesh prove "
    "(the TPU bench exercises the compiled path at full size)",
)
def test_mesh_prove_bit_identical_and_verifies(toy):
    """The COMPOSED sharded path — prove_batch(mesh=...) through
    _prove_sharded -> host assembly -> verify — produces bit-identical
    proofs to the unsharded prover under fixed blinding, and they verify."""
    cc, pk, w = toy
    base = prove_batch(pk, cc, w, rng=random.Random(42))
    mesh = make_mesh(8, dp=2)
    shard = prove_batch(pk, cc, w, rng=random.Random(42), mesh=mesh)
    for (a, pa), (b, pb) in zip(base, shard):
        assert (a.a, a.b, a.c, pa) == (b.a, b.b, b.c, pb)
    for proof, publics in shard:
        assert verify(pk.vk, proof, publics)
