"""Benchmark subcircuits: the BASELINE.md config ladder below the full
EmailVerifier.

The reference publishes per-component constraint counts
(packages/circuits/email-verifier.circom:66 SHA-256 header ~506k, :86
RSA-2048 verify ~149k) and its docs benchmark the SHA / RSA subcircuits
separately before the full pipeline. These builders expose the same two
stages as standalone provable circuits for `bench.py`
(BENCH_CONFIG=sha640 / rsa2048), reusing the production gadgets unchanged.
"""

from __future__ import annotations

import numpy as np

from ..circuits.builder import ConstraintSystem
from ..circuits.gadgets.basic import num2bits
from ..circuits.gadgets.poseidon_gadget import poseidon_large
from ..circuits.gadgets.rsa import rsa_verifier_65537
from ..circuits.gadgets.sha_wrappers import pack_digest_hi_lo, sha256_bytes


def build_sha_bench(max_len: int) -> ConstraintSystem:
    """Variable-length SHA-256 over a padded byte buffer, digest public.

    The header-hash stage of the EmailVerifier in isolation
    (email-verifier.circom:63-67): zero-padding assertion elided (no
    downstream consumer), digest packed hi/lo as the two public outputs."""
    cs = ConstraintSystem(f"sha_bench_{max_len}")
    data = cs.add_input("emailHeader", (max_len,))
    length = cs.add_input("emailHeaderLength", ())
    with cs.scope("sha256"):
        digest, _sha = sha256_bytes(cs, data, length)
        hi, lo = pack_digest_hi_lo(cs, digest)
    cs.mark_public(hi)
    cs.mark_public(lo)
    return cs


def build_rsa_bench() -> ConstraintSystem:
    """RSA-2048 (e=65537) PKCS1v15-SHA256 verify in isolation.

    The signature stage of the EmailVerifier (email-verifier.circom:87-95)
    with the digest as a bit-constrained INPUT instead of an in-circuit
    SHA, plus the Poseidon pubkey commitment as the public output
    (email-verifier.circom:173)."""
    cs = ConstraintSystem("rsa_bench")
    pubkey = cs.add_input("pubkey", (17,), dtype="fr")
    signature = cs.add_input("signature", (17,), dtype="fr")
    digest_bits = cs.add_input("digestBits", (8, 32))
    num2bits(cs, digest_bits, 1)  # boolean-constrain the digest input
    with cs.scope("rsa_verify"):
        rsa_verifier_65537(cs, signature, pubkey, digest_bits, ns="rsa")
    with cs.scope("pubkey_poseidon"):
        pk_hash = poseidon_large(cs, pubkey)
    cs.mark_public(pk_hash)
    hi, lo = pack_digest_hi_lo(cs, digest_bits)
    cs.mark_public(hi)
    cs.mark_public(lo)
    return cs


def build_email_reveal_bench(
    max_headers_length: int = 640,
    max_body_length: int = 768,
    max_reveal: int = 32,
) -> ConstraintSystem:
    """EmailVerifier + substring reveal — the BASELINE.md "EmailVerifier +
    regex reveal" benchmark config.

    The reference's application pattern (e.g. Proof-of-Twitter) composes
    EmailVerifier with RevealSubstring over the signed header
    (packages/circuits/helpers/reveal-substring.circom:13) and packs the
    revealed bytes as public signals (utils/regex.circom:62 PackRegexReveal
    role). Reveal window is bounds-checked against the header and packed
    31-bytes-per-field (PackBytes:28)."""
    from ..circuits.gadgets.bytes import pack_bytes
    from ..circuits.gadgets.email_helpers import reveal_substring
    from .email_verifier import EmailVerifierConfig, build_email_verifier

    cfg = EmailVerifierConfig(
        max_headers_length=max_headers_length,
        max_body_length=max_body_length,
        ignore_body_hash_check=False,
    )
    handles = build_email_verifier(cfg)
    cs = handles.cs
    header = next(b.signals for b in cs.input_bindings if b.name == "emailHeader")
    start = cs.add_input("revealStart", ())
    length = cs.add_input("revealLength", ())
    with cs.scope("reveal_substring"):
        sub = reveal_substring(cs, header, start, length, max_reveal)
        packed = pack_bytes(cs, sub)
    cs.mark_public(packed)
    return cs


def digest_to_bits(digest: bytes) -> np.ndarray:
    """SHA-256 digest -> the (8, 32) LSB-first word-bit layout sha256_bytes
    produces (sha_wrappers.sha256_bytes returns (8, 32) LSB-first bits)."""
    words = [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") for i in range(8)
    ]
    out = np.zeros((8, 32), dtype=np.int32)
    for i, w in enumerate(words):
        for j in range(32):
            out[i, j] = (w >> j) & 1
    return out
