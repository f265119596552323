"""Groth16 trusted setup (per-circuit CRS generation).

Replaces the snarkjs powersoftau + zkey pipeline
(docs/zk-email-docs/UsageGuide Steps 5-6) with a self-contained setup: QAP
polynomials evaluated at tau host-side (Python bigints, cached), group
elements materialized with a batched fixed-base windowed multiplier on
device (ops/msm.fixed_base_batch).

NOTE: like snarkjs' `groth16 setup` without a ceremony, toxic waste lives in
process memory — fine for proving infrastructure parity and benchmarks; a
real MPC ceremony is out of scope.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np

from ..core import curve_jax as CJ
from ..core import field as F
from ..core import limbs as LB
from ..core.curve import G1, G2
from ..prover.containers import VerifyingKey
from ..ops.msm import fixed_base_batch, g2_points_from_affine, points_from_affine_ints

P = F.R


def _batch_inv(vals: list[int]) -> list[int]:
    """Montgomery-trick batch inverse over Python ints."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % P
    inv_total = pow(prefix[n], P - 2, P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_total % P
        inv_total = inv_total * vals[i] % P
    return out


@dataclass
class ProvingKey:
    domain_log2: int
    n_public: int
    # host points
    alpha_g1: G1
    beta_g1: G1
    beta_g2: G2
    delta_g1: G1
    delta_g2: G2
    # device point tables (projective pytrees)
    a_query: dict
    b1_query: dict
    b2_query: dict
    c_query: dict  # for signals n_public+1 .. n_signals-1
    h_query: dict
    vk: VerifyingKey = None
    # constraint count of the underlying R1CS (excluding the nPublic+1
    # virtual instance rows the QAP appends) — the prover's h stage needs it
    # to place the instance values at rows nC..nC+nPublic (compute_h)
    n_constraints: int = 0


def domain_log2_for(cc) -> int:
    """Domain size covering the R1CS rows PLUS the nPublic+1 virtual
    instance rows (standard Groth16 / snarkjs sizing)."""
    m = 1
    log_m = 0
    while m < max(cc.n_constraints + cc.n_public + 1, 2):
        m *= 2
        log_m += 1
    return log_m


def qap_evaluations(cc, tau: int):
    """u_j(tau), v_j(tau), w_j(tau) for every signal j (host Python ints).

    Includes the standard Groth16 instance rows (snarkjs zkey setup /
    arkworks generator parity): virtual constraint row nC+s carries public
    signal s in the A matrix only, pinning the publics' u-polynomials
    outside the span of the real constraints."""
    log_m = domain_log2_for(cc)
    m = 1 << log_m
    omega = F.fr_nth_root(log_m)
    # Lagrange basis at tau: L_i(tau) = Z(tau) * omega^i / (m * (tau - omega^i))
    z_tau = (pow(tau, m, P) - 1) % P
    omegas = [1] * m
    for i in range(1, m):
        omegas[i] = omegas[i - 1] * omega % P
    denoms = [(tau - omegas[i]) % P for i in range(m)]
    inv_denoms = _batch_inv(denoms)
    m_inv = pow(m, P - 2, P)
    lag = [z_tau * omegas[i] % P * inv_denoms[i] % P * m_inv % P for i in range(m)]

    u = [0] * cc.n_signals
    v = [0] * cc.n_signals
    w = [0] * cc.n_signals
    for (rows, cols, cfs), dest in ((cc.A, u), (cc.B, v), (cc.C, w)):
        for r, c, cf in zip(rows, cols, cfs):
            dest[int(c)] = (dest[int(c)] + int(cf) * lag[int(r)]) % P
    for s in range(cc.n_public + 1):
        u[s] = (u[s] + lag[cc.n_constraints + s]) % P
    return u, v, w, log_m, z_tau


def groth16_setup_cached(cc, seed: int = 0, cache_dir: str | None = None) -> ProvingKey:
    """Disk-cached setup: the CRS for a fixed (circuit, seed) is immutable."""
    import pickle
    from pathlib import Path

    import jax.numpy as jnp

    if not cache_dir:
        return groth16_setup(cc, seed)
    # key includes a digest of the constraint coefficients so any circuit
    # change (e.g. new hash constants) invalidates old CRS blobs
    import hashlib

    h = hashlib.sha256()
    for rows, cols, cfs in (cc.A, cc.B, cc.C):
        h.update(np.ascontiguousarray(rows).tobytes())
        h.update(np.ascontiguousarray(cols).tobytes())
        h.update(len(cfs).to_bytes(8, "little"))
        for cf in list(cfs[:64]) + list(cfs[-64:]):
            h.update((int(cf) % (1 << 256)).to_bytes(32, "little"))
    digest = h.hexdigest()[:12]
    # v3: CircomReduction H basis + instance rows (r3) — older coefficient-
    # basis CRS blobs are silently incompatible, so the format version is
    # part of the cache key
    path = Path(cache_dir) / f"pk3_{cc.name}_{cc.n_constraints}_{cc.n_signals}_{digest}_{seed}.pkl"
    if path.exists():
        with open(path, "rb") as f:
            blob = pickle.load(f)
        for q in ("a_query", "b1_query", "b2_query", "c_query", "h_query"):
            blob[q] = {
                k: (tuple(jnp.asarray(c) for c in v) if isinstance(v, tuple) else jnp.asarray(v))
                for k, v in blob[q].items()
            }
        return ProvingKey(**blob)
    pk = groth16_setup(cc, seed)
    blob = dict(pk.__dict__)
    for q in ("a_query", "b1_query", "b2_query", "c_query", "h_query"):
        blob[q] = {
            k: (tuple(np.asarray(c) for c in v) if isinstance(v, tuple) else np.asarray(v))
            for k, v in blob[q].items()
        }
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    return pk


def groth16_setup(cc, seed: int = 0, progress=None) -> ProvingKey:
    rng = random.Random(seed or None)
    tau = rng.randrange(1, P)
    alpha = rng.randrange(1, P)
    beta = rng.randrange(1, P)
    gamma = rng.randrange(1, P)
    delta = rng.randrange(1, P)

    import time as _time

    _t = [_time.time()]

    def log(msg):
        now = _time.time()
        if progress:
            progress(f"{msg} [+{now - _t[0]:.1f}s]")
        _t[0] = now

    log("qap evaluations...")
    u, v, w, log_m, z_tau = qap_evaluations(cc, tau)
    log("qap done")
    m = 1 << log_m
    n_pub = cc.n_public
    gamma_inv = pow(gamma, P - 2, P)
    delta_inv = pow(delta, P - 2, P)

    # scalar vectors for the queries
    a_scalars = u
    b_scalars = v
    k_scalars = [
        (beta * u[j] + alpha * v[j] + w[j]) % P for j in range(cc.n_signals)
    ]
    ic_scalars = [k_scalars[j] * gamma_inv % P for j in range(n_pub + 1)]
    c_scalars = [k_scalars[j] * delta_inv % P for j in range(n_pub + 1, cc.n_signals)]
    # h query scalars — the snarkjs / CircomReduction basis: H_i embeds the
    # odd-indexed Lagrange polynomial over the DOUBLE domain at tau,
    #   s_i = L_{2i+1}^{(2m)}(tau) / delta
    #       = Z_{2m}(tau) * x_i / (2m * (tau - x_i) * delta),  x_i = sigma*omega^i
    # (sigma a primitive 2m-th root). Pairing these with the prover's h
    # evaluations on sigma*D yields [h(tau)*Z(tau)/delta]: on sigma*D the
    # vanishing polynomial of D is Z(x_i) = sigma^m*omega^{im} - 1 = -2, a
    # constant, which this basis absorbs. Interop target: snarkjs pointsH
    # (zkey section 9) consumed via ark-circom's CircomReduction
    # (rust-verifier/src/verifier_utils.rs:20-23).
    sigma = F.fr_nth_root(log_m + 1)
    omega = F.fr_nth_root(log_m)
    xs = [0] * m
    acc = sigma
    for i in range(m):
        xs[i] = acc
        acc = acc * omega % P
    z2_tau = (pow(tau, 2 * m, P) - 1) % P
    inv_d = _batch_inv([(tau - x) % P for x in xs])
    coef = z2_tau * pow(2 * m, P - 2, P) % P * delta_inv % P
    h_scalars = [coef * xs[i] % P * inv_d[i] % P for i in range(m)]

    # CRS materialization: on an attached accelerator the jitted fold is
    # orders of magnitude faster than the eager CPU path (354k-signal
    # EmailVerifier: minutes -> seconds), so only fall back to CPU when no
    # accelerator exists.
    import jax as _jax

    on_cpu = _jax.default_backend() == "cpu"
    log("a query...")
    a_query = fixed_base_batch("g1", a_scalars, on_cpu=on_cpu)
    log("b1 query...")
    b1_query = fixed_base_batch("g1", b_scalars, on_cpu=on_cpu)
    log("b2 query...")
    b2_query = fixed_base_batch("g2", b_scalars, on_cpu=on_cpu)
    log("c query...")
    c_query = fixed_base_batch("g1", c_scalars, on_cpu=on_cpu)
    log("h query...")
    h_query = fixed_base_batch("g1", h_scalars, on_cpu=on_cpu)
    log("queries done")
    ic_pts = [G1.generator().mul(s) for s in ic_scalars]

    g1, g2 = G1.generator(), G2.generator()
    vk = VerifyingKey(
        alpha_g1=g1.mul(alpha),
        beta_g2=g2.mul(beta),
        gamma_g2=g2.mul(gamma),
        delta_g2=g2.mul(delta),
        ic=ic_pts,
    )
    return ProvingKey(
        domain_log2=log_m,
        n_public=n_pub,
        alpha_g1=g1.mul(alpha),
        beta_g1=g1.mul(beta),
        beta_g2=g2.mul(beta),
        delta_g1=g1.mul(delta),
        delta_g2=g2.mul(delta),
        a_query=a_query,
        b1_query=b1_query,
        b2_query=b2_query,
        c_query=c_query,
        h_query=h_query,
        vk=vk,
        n_constraints=cc.n_constraints,
    )
