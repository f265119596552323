"""Benchmark: Groth16 proving throughput for the EmailVerifier circuit on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline model (the reference publishes no wall-clock numbers, BASELINE.md):
snarkjs single-core Groth16 proving is modeled at 15 us/constraint —
~30 s for the full ~2M-constraint EmailVerifier, consistent with community
reports for circuits of this size. vs_baseline = our_throughput /
(1 / (15e-6 * n_constraints)) for the same constraint count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SNARKJS_SEC_PER_CONSTRAINT = 15e-6


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkemail_tpu.core import limbs as LB
    from zkemail_tpu.helpers.input_gen import InputGenArgs, generate_email_verifier_inputs
    from zkemail_tpu.helpers.testkit import LocalDKIMSigner
    from zkemail_tpu.models.email_verifier import EmailVerifierConfig, build_email_verifier
    from zkemail_tpu.models.input_bridge import prepare_inputs
    from zkemail_tpu.prover.containers import verify
    from zkemail_tpu.prover.groth16 import prove
    from zkemail_tpu.prover.setup import groth16_setup, groth16_setup_cached

    cfg = EmailVerifierConfig(
        max_headers_length=int(os.environ.get("BENCH_MAX_HEADERS", "448")),
        max_body_length=192,
        ignore_body_hash_check=True,
    )
    handles = build_email_verifier(cfg)
    cc = handles.cs.compile()

    signer = LocalDKIMSigner()
    eml = signer.sign_email(body=b"benchmark body\r\n")
    raw = generate_email_verifier_inputs(
        eml,
        signer.resolver(),
        InputGenArgs(
            ignore_body_hash_check=True,
            max_headers_length=cfg.max_headers_length,
            max_body_length=cfg.max_body_length,
        ),
    )
    inputs = prepare_inputs([raw], cfg)

    from zkemail_tpu.utils.scan import jit_on_accel

    print(f"# built: {cc.n_constraints} constraints, {cc.n_signals} signals", file=sys.stderr, flush=True)
    t0 = time.time()
    import zkemail_tpu.prover.setup as _setup_mod
    _orig = _setup_mod.groth16_setup
    def _with_progress(cc2, seed=0, progress=None):
        return _orig(cc2, seed, progress=lambda m: print(f"# setup: {m}", file=sys.stderr, flush=True))
    _setup_mod.groth16_setup = _with_progress
    try:
        pk = groth16_setup_cached(cc, seed=1, cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache"))
    finally:
        _setup_mod.groth16_setup = _orig
    setup_s = time.time() - t0
    print(f"# setup done in {setup_s:.1f}s", file=sys.stderr, flush=True)
    # move the CRS queries to the accelerator once
    if jax.default_backend() != "cpu":
        dev = jax.devices()[0]
        for qname in ("a_query", "b1_query", "b2_query", "c_query", "h_query"):
            q = getattr(pk, qname)
            setattr(pk, qname, jax.tree_util.tree_map(lambda c: jax.device_put(c, dev), q))
        print("# queries on device", file=sys.stderr, flush=True)

    # witness generation (timed separately; first call includes compiles).
    # The witness graph is tens of MB of HLO — too large for the tunneled
    # TPU compile helper — and is a tiny fraction of proving cost, so it
    # runs on the host CPU backend (eager, cached small kernels); the TPU
    # is reserved for the prove phase.
    cpu = jax.devices("cpu")[0]

    def wit_fn(inp):
        inp = jax.device_put(inp, cpu)
        with jax.default_device(cpu):
            return cc.eval_witness(inp, 1)
    t0 = time.time()
    w = wit_fn(inputs)
    w.block_until_ready()
    witness_first_s = time.time() - t0
    print(f"# witness first {witness_first_s:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    w = wit_fn(inputs)
    w.block_until_ready()
    witness_s = time.time() - t0
    print(f"# witness steady {witness_s:.2f}s", file=sys.stderr, flush=True)

    witness = jax.device_put(np.asarray(w[:, :, 0]), jax.devices()[0])
    t0 = time.time()
    proof, publics = prove(pk, cc, witness)
    prove_first_s = time.time() - t0
    print(f"# prove first {prove_first_s:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    proof, publics = prove(pk, cc, witness)
    prove_s = time.time() - t0
    print(f"# prove steady {prove_s:.2f}s", file=sys.stderr, flush=True)

    ok = verify(pk.vk, proof, publics)
    total_s = witness_s + prove_s
    proofs_per_sec = 1.0 / total_s if total_s > 0 else 0.0
    baseline_pps = 1.0 / (SNARKJS_SEC_PER_CONSTRAINT * cc.n_constraints)

    result = {
        "metric": "emailverifier_groth16_proofs_per_sec",
        "value": round(proofs_per_sec, 4),
        "unit": "proofs/s",
        "vs_baseline": round(proofs_per_sec / baseline_pps, 2),
        "detail": {
            "n_constraints": cc.n_constraints,
            "n_signals": cc.n_signals,
            "config": f"headers={cfg.max_headers_length},body=skipped",
            "witness_ms": round(witness_s * 1000, 1),
            "prove_s": round(prove_s, 2),
            "witness_first_s": round(witness_first_s, 2),
            "prove_first_s": round(prove_first_s, 2),
            "setup_s": round(setup_s, 2),
            "verified": bool(ok),
            "backend": jax.default_backend(),
            "baseline_model": "snarkjs @ 15us/constraint single-core",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
