"""Benchmark subcircuits (models/subcircuits.py): end-to-end witness parity
+ R1CS satisfaction for the sha640 / rsa2048 BENCH_CONFIG ladder."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkemail_tpu.core import limbs as LB
from zkemail_tpu.helpers import sha_utils as SU
from zkemail_tpu.models.subcircuits import (
    build_rsa_bench,
    build_sha_bench,
    digest_to_bits,
)


def _publics(cc, w):
    vals = LB.limbs_to_ints(np.asarray(w[:, :, 0]))
    return [int(vals[i]) for i in range(1, cc.n_public + 1)]


def test_sha_bench_circuit_parity():
    cc = build_sha_bench(128).compile()
    msg = b"bench subcircuit sha parity"
    padded, plen = SU.sha256_pad(msg, 128)
    inputs = {
        "emailHeader": jnp.asarray(
            np.frombuffer(padded, dtype=np.uint8).astype(np.int32)[:, None]
        ),
        "emailHeaderLength": jnp.asarray(np.array([plen], dtype=np.int32)),
    }
    w = cc.eval_witness(inputs, 1)
    digest = SU.sha256(msg)
    hi, lo = _publics(cc, w)
    assert hi == int.from_bytes(digest[:16], "big")
    assert lo == int.from_bytes(digest[16:], "big")
    wi = LB.limbs_to_ints(np.asarray(w[:, :, 0]))
    assert cc.check_satisfied_host([int(x) for x in wi])


def test_rsa_bench_circuit_parity():
    from zkemail_tpu.circuits.advice import rsa_advice, stack_advice
    from zkemail_tpu.helpers.binary_format import to_circom_bigint
    from zkemail_tpu.helpers.dkim import verify_dkim_signature
    from zkemail_tpu.helpers.testkit import LocalDKIMSigner

    signer = LocalDKIMSigner()
    res = verify_dkim_signature(signer.sign_email(), signer.resolver())
    cc = build_rsa_bench().compile()

    n, _e = res.public_key
    pk = np.array([[int(v)] for v in to_circom_bigint(n)], dtype=object)
    sg = np.array([[int(v)] for v in to_circom_bigint(res.signature)], dtype=object)
    bits = digest_to_bits(SU.sha256(res.headers))[:, :, None]
    inputs = {
        "pubkey": jnp.asarray(LB.ints_to_limbs(pk)),
        "signature": jnp.asarray(LB.ints_to_limbs(sg)),
        "digestBits": jnp.asarray(bits.astype(np.int32)),
    }
    inputs.update(
        {k: jnp.asarray(v) for k, v in stack_advice([rsa_advice(res.signature, n)]).items()}
    )
    w = cc.eval_witness(inputs, 1)
    wi = LB.limbs_to_ints(np.asarray(w[:, :, 0]))
    assert cc.check_satisfied_host([int(x) for x in wi])
    # tampered digest bit -> unsatisfiable (soundness sanity)
    bad = np.array(bits)
    bad[0, 0, 0] ^= 1
    inputs["digestBits"] = jnp.asarray(bad.astype(np.int32))
    w2 = cc.eval_witness(inputs, 1)
    wi2 = LB.limbs_to_ints(np.asarray(w2[:, :, 0]))
    assert not cc.check_satisfied_host([int(x) for x in wi2])


def test_email_reveal_bench_circuit_parity():
    """EmailVerifier + substring reveal (the BASELINE "regex reveal" bench
    config): R1CS satisfied, revealed subject packed into the tail publics,
    and an out-of-window reveal start is rejected."""
    from zkemail_tpu.helpers.input_gen import (
        InputGenArgs,
        generate_email_verifier_inputs,
    )
    from zkemail_tpu.helpers.testkit import LocalDKIMSigner
    from zkemail_tpu.models.email_verifier import EmailVerifierConfig
    from zkemail_tpu.models.input_bridge import prepare_inputs
    from zkemail_tpu.models.subcircuits import build_email_reveal_bench

    signer = LocalDKIMSigner()
    eml = signer.sign_email(subject="bench email 0", body=b"reveal body\r\n")
    cc = build_email_reveal_bench(448, 192, max_reveal=32).compile()
    cfg = EmailVerifierConfig(
        max_headers_length=448, max_body_length=192, ignore_body_hash_check=False
    )
    args = InputGenArgs(max_headers_length=448, max_body_length=192)
    raw = generate_email_verifier_inputs(eml, signer.resolver(), args)
    inputs = prepare_inputs([raw], cfg)
    hdr = bytes(int(v) for v in raw["emailHeader"])
    needle = b"subject:bench email 0"
    pos = hdr.find(needle)
    assert pos >= 0
    inputs["revealStart"] = jnp.asarray(np.array([pos], dtype=np.int32))
    inputs["revealLength"] = jnp.asarray(np.array([len(needle)], dtype=np.int32))
    w = cc.eval_witness(inputs, 1)
    assert cc.check_satisfied_device(w[:, :, 0])
    # revealed bytes packed 31-per-field, little-endian, in the tail publics
    pubs = _publics(cc, w)
    packed0 = int.from_bytes(needle[:31].ljust(31, b"\x00"), "little")
    assert packed0 in pubs
    # reveal window past the header end -> unsatisfiable
    inputs["revealStart"] = jnp.asarray(np.array([448], dtype=np.int32))
    w2 = cc.eval_witness(inputs, 1)
    assert not cc.check_satisfied_device(w2[:, :, 0])
