"""Batched Poseidon permutation over Fr in JAX (limb vector core).

Used by the witness generator (in-circuit Poseidon parity values), the
registry tooling (hashing many DKIM keys at once), and benchmarks.  Shares
parameters with the Python reference in ``core.poseidon``.

Layout: a batch of states is ``(L, t, B)`` — limbs leading (see core.limbs),
width t in the middle, batch B on the minor axis so the VPU lanes are full.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import limbs as LB
from .poseidon import N_ROUNDS_F, N_ROUNDS_P, poseidon_params

L = F.LIMBS


def _fold_add(fs, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Tree-reduce field addition along `axis` (which indexes batch dims)."""
    # x: (L, ..., k, ...) — reduce the (axis)-th *batch* dim (axis counted with
    # limb axis included, so axis >= 1).
    while x.shape[axis] > 1:
        k = x.shape[axis]
        half = k // 2
        a = jax.lax.slice_in_dim(x, 0, half, axis=axis)
        b = jax.lax.slice_in_dim(x, half, 2 * half, axis=axis)
        s = LB.add(fs, a, b)
        if k % 2:
            s = jnp.concatenate([s, jax.lax.slice_in_dim(x, 2 * half, k, axis=axis)], axis=axis)
        x = s
    return x


@functools.lru_cache(maxsize=None)
def _mont_params(t: int):
    """Round constants and MDS in Montgomery limb form (numpy)."""
    consts, mds = poseidon_params(t)
    r_p = N_ROUNDS_P[t - 2]
    n_rounds = N_ROUNDS_F + r_p
    pf = F.FR
    c = np.array(
        [
            [F.to_limbs(pf.to_mont(consts[r * t + i])) for i in range(t)]
            for r in range(n_rounds)
        ],
        dtype=np.int32,
    )  # (rounds, t, L)
    c = np.moveaxis(c, -1, 1)  # (rounds, L, t)
    m = np.array(
        [[F.to_limbs(pf.to_mont(mds[i][j])) for j in range(t)] for i in range(t)],
        dtype=np.int32,
    )  # (t_out, t_in, L)
    m = np.moveaxis(m, -1, 0)  # (L, t_out, t_in)
    return c, m


def _sbox(fs, x):
    x2 = LB.mont_mul(fs, x, x)
    x4 = LB.mont_mul(fs, x2, x2)
    return LB.mont_mul(fs, x4, x)


def permute_jax(state: jnp.ndarray) -> jnp.ndarray:
    """Poseidon permutation on a batch of states.

    state: (L, t, B) Fr Montgomery limbs. Returns same shape.
    """
    fs = LB.FR_SPEC
    t = state.shape[1]
    r_f, r_p = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    c_np, m_np = _mont_params(t)
    consts = jnp.asarray(c_np)[..., None]  # (rounds, L, t, 1)
    mds = jnp.asarray(m_np)[:, :, :, None]  # (L, t_out, t_in, 1)

    def mix(s):
        # s: (L, t, B) -> (L, 1, t_in, B); mds: (L, t_out, t_in, 1)
        prod = LB.mont_mul(fs, mds, s[:, None, :, :])  # (L, t_out, t_in, B)
        return _fold_add(fs, prod, axis=2)[:, :, 0, :]  # (L, t_out, B)

    def full_round(s, c):
        s = LB.add(fs, s, c)
        s = _sbox(fs, s)
        return mix(s), None

    def partial_round(s, c):
        s = LB.add(fs, s, c)
        s0 = _sbox(fs, s[:, :1, :])
        s = jnp.concatenate([s0, s[:, 1:, :]], axis=1)
        return mix(s), None

    half = r_f // 2
    s, _ = jax.lax.scan(full_round, state, consts[:half])
    s, _ = jax.lax.scan(partial_round, s, consts[half : half + r_p])
    s, _ = jax.lax.scan(full_round, s, consts[half + r_p :])
    return s


def poseidon_jax(inputs: jnp.ndarray) -> jnp.ndarray:
    """Batched circom-style hash: inputs (L, n, B) -> (L, B).

    state = [0, inputs...]; returns state[0] after the permutation.
    Inputs/outputs in Montgomery form.
    """
    n = inputs.shape[1]
    b = inputs.shape[2]
    zero = jnp.zeros((L, 1, b), dtype=jnp.int32)
    state = jnp.concatenate([zero, inputs], axis=1)
    return permute_jax(state)[:, 0, :]
