"""Radix-2 NTT over BN254 Fr (limb vector core).

The polynomial engine under Groth16's QAP division (the role snarkjs'
wasmcurves FFT plays in the reference prove path,
packages/helpers/src/chunked-zkey.ts:76-91).

Design: iterative Cooley-Tukey, stage twiddles precomputed host-side in
Montgomery form; each stage is a reshape + one batched mont_mul + add/sub on
(L, n/2) arrays — log2(n) fused VPU passes, no data-dependent control flow.
Multi-chip: the four-step decomposition in parallel/sharding.py splits a
length-m NTT into local radix-2 stages plus one cross-shard DFT (all_gather
over the "msm" mesh axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field as F
from ..core import limbs as LB

L = F.LIMBS
P = F.R
FS = LB.FR_SPEC


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Montgomery-form twiddle limb arrays per stage.

    Stage s (m = 2^(s+1)) uses w_m^j for j < m/2, laid out per butterfly
    position across the n/2 pairs."""
    n = 1 << log_n
    w = F.fr_nth_root(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    out = []
    for s in range(log_n):
        m = 1 << (s + 1)
        wm = pow(w, n // m, P)
        tw = []
        acc = 1
        for j in range(m // 2):
            tw.append(F.FR.to_mont(acc))
            acc = acc * wm % P
        out.append(LB.ints_to_limbs(np.array(tw, dtype=object)))
    return out


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for i in range(n):
        b = 0
        x = i
        for _ in range(log_n):
            b = (b << 1) | (x & 1)
            x >>= 1
        rev[i] = b
    return rev


@functools.lru_cache(maxsize=None)
def _n_inv_mont(log_n: int) -> np.ndarray:
    n_inv = pow(1 << log_n, P - 2, P)
    return LB.ints_to_limbs(np.array([F.FR.to_mont(n_inv)], dtype=object))[:, 0]


def domain_plan(log_n: int) -> dict:
    """All host-precomputed NTT/shift constants as ONE pytree of arrays.

    Inside jit these must arrive as *arguments*, not closure constants: the
    twiddle tables total ~4x the polynomial size, and inlining them blows the
    HLO past what a tunneled TPU compile endpoint accepts (HTTP 413 was the
    round-1 bench failure mode). Pass plan = domain_plan(log_m) into the
    jitted prove program and thread it to ntt()/shifted_ntt()."""
    return {
        "perm": _bit_reverse_perm(log_n),
        "tw_fwd": tuple(_stage_twiddles(log_n, False)),
        "tw_inv": tuple(_stage_twiddles(log_n, True)),
        "ninv": _n_inv_mont(log_n),
        "shift": _shift_powers(log_n),
    }


def ntt(values: jnp.ndarray, inverse: bool = False, plan: dict | None = None) -> jnp.ndarray:
    """NTT/iNTT of (L, n, ...) Montgomery-form Fr values, n a power of two.

    Trailing axes after the polynomial axis are independent batch lanes
    (the DP proof batch) — each stage's butterfly mont_mul vectorizes over
    them for free. Pass `plan` (domain_plan) when tracing under jit so the
    twiddles are function arguments rather than giant inline constants.
    """
    n = values.shape[1]
    rest = values.shape[2:]
    r1 = (1,) * len(rest)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    perm = plan["perm"] if plan is not None else _bit_reverse_perm(log_n)
    tws = (
        (plan["tw_inv"] if inverse else plan["tw_fwd"])
        if plan is not None
        else _stage_twiddles(log_n, inverse)
    )
    x = values[:, perm]
    for s in range(log_n):
        m = 1 << (s + 1)
        half = m // 2
        xr = x.reshape((L, n // m, m) + rest)
        even = xr[:, :, :half]
        odd = xr[:, :, half:]
        tw = jnp.asarray(tws[s]).reshape((L, 1, half) + r1)
        t = LB.mont_mul(FS, odd, jnp.broadcast_to(tw, odd.shape))
        x = jnp.concatenate(
            [LB.add(FS, even, t), LB.sub(FS, even, t)], axis=2
        ).reshape((L, n) + rest)
    if inverse:
        ninv_arr = plan["ninv"] if plan is not None else _n_inv_mont(log_n)
        ninv = jnp.asarray(ninv_arr).reshape((L, 1) + r1)
        x = LB.mont_mul(FS, x, jnp.broadcast_to(ninv, x.shape))
    return x


@functools.lru_cache(maxsize=None)
def _coset_powers(log_n: int, inverse: bool):
    """Montgomery powers of the coset shift g (or g^-1)."""
    n = 1 << log_n
    g = F.FR_MULT_GENERATOR
    if inverse:
        g = pow(g, P - 2, P)
    pw = []
    acc = 1
    for _ in range(n):
        pw.append(F.FR.to_mont(acc))
        acc = acc * g % P
    return LB.ints_to_limbs(np.array(pw, dtype=object))


def coset_scale(values: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Multiply coefficient i by g^i (or g^-i) — coset evaluation shift.

    General polynomial utility (coset-domain products in tests); the prover
    itself uses the sigma shift (shift_scale) of the CircomReduction basis.
    """
    n = values.shape[1]
    log_n = n.bit_length() - 1
    pw = jnp.asarray(_coset_powers(log_n, inverse))
    pw = pw.reshape(pw.shape + (1,) * (values.ndim - 2))
    return LB.mont_mul(FS, values, pw)


def coset_ntt(coeffs: jnp.ndarray, plan: dict | None = None) -> jnp.ndarray:
    return ntt(coset_scale(coeffs), inverse=False, plan=plan)


def coset_intt(evals: jnp.ndarray, plan: dict | None = None) -> jnp.ndarray:
    return coset_scale(ntt(evals, inverse=True, plan=plan), inverse=True)


@functools.lru_cache(maxsize=None)
def _shift_powers(log_n: int) -> np.ndarray:
    """Montgomery powers of sigma = primitive 2^(log_n+1)-th root of unity.

    Scaling coefficient i by sigma^i then NTT'ing evaluates the polynomial on
    the shifted domain sigma*D = the odd-indexed 2n-th roots of unity — the
    domain snarkjs / ark-circom's CircomReduction use for the h polynomial
    (rust-verifier/src/verifier_utils.rs:20-23; distribute_powers +
    fft in ark-circom's witness map)."""
    n = 1 << log_n
    s = F.fr_nth_root(log_n + 1)
    pw = []
    acc = 1
    for _ in range(n):
        pw.append(F.FR.to_mont(acc))
        acc = acc * s % P
    return LB.ints_to_limbs(np.array(pw, dtype=object))


def shift_scale(values: jnp.ndarray, plan: dict | None = None) -> jnp.ndarray:
    """Multiply coefficient i by sigma^i (sigma^2 = omega)."""
    n = values.shape[1]
    log_n = n.bit_length() - 1
    pw = jnp.asarray(plan["shift"] if plan is not None else _shift_powers(log_n))
    pw = pw.reshape(pw.shape + (1,) * (values.ndim - 2))
    return LB.mont_mul(FS, values, pw)


def shifted_ntt(coeffs: jnp.ndarray, plan: dict | None = None) -> jnp.ndarray:
    """Evaluate a coefficient vector on sigma*D (the CircomReduction domain)."""
    return ntt(shift_scale(coeffs, plan=plan), inverse=False, plan=plan)
