"""EmailVerifier model tests: full variants on real self-signed DKIM emails.

The "email-verifier.test.ts" analog (SURVEY §4.1): positive runs satisfy the
R1CS with the expected public outputs; negative runs (tampered inputs)
violate it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.core import limbs as LB
from zkemail_tpu.core.poseidon import poseidon_large
from zkemail_tpu.helpers.input_gen import InputGenArgs, generate_email_verifier_inputs
from zkemail_tpu.helpers.testkit import LocalDKIMSigner
from zkemail_tpu.helpers.sha_utils import sha256
from zkemail_tpu.models.email_verifier import EmailVerifierConfig, build_email_verifier
from zkemail_tpu.models.input_bridge import prepare_inputs

SIGNER = LocalDKIMSigner()


def build_and_eval(cfg, eml, args):
    handles = build_email_verifier(cfg)
    cc = handles.cs.compile()
    raw = generate_email_verifier_inputs(eml, SIGNER.resolver(), args)
    inputs = prepare_inputs([raw], cfg)
    w = cc.eval_witness(inputs, 1)
    return handles, cc, w, raw


def val_of(cc, vals, sv):
    flat = sv.idx.reshape(-1)
    out = [vals[int(cc.perm[i])] for i in flat]
    return out if len(out) > 1 else out[0]


@pytest.fixture(scope="module")
def no_body_run():
    cfg = EmailVerifierConfig(
        max_headers_length=448, max_body_length=192, ignore_body_hash_check=True
    )
    eml = SIGNER.sign_email(body=b"model test body\r\n")
    args = InputGenArgs(
        ignore_body_hash_check=True, max_headers_length=448, max_body_length=192
    )
    return build_and_eval(cfg, eml, args), eml


def test_email_verifier_no_body(no_body_run):
    (handles, cc, w, raw), eml = no_body_run
    witness = w[:, :, 0]
    assert cc.check_satisfied_device(witness)
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(witness))]
    # public outputs: pubkeyHash matches host poseidonLarge of the modulus
    assert val_of(cc, vals, handles.pubkey_hash) == poseidon_large(
        SIGNER.public_key[0], 121, 9
    )
    # shaHi/shaLo reconstruct the header digest
    from zkemail_tpu.helpers.dkim import verify_dkim_signature

    res = verify_dkim_signature(eml, SIGNER.resolver())
    digest = sha256(res.headers)
    hi = int.from_bytes(digest[:16], "big")
    lo = int.from_bytes(digest[16:], "big")
    assert val_of(cc, vals, handles.sha_hi) == hi
    assert val_of(cc, vals, handles.sha_lo) == lo


def test_email_verifier_no_body_tampered_signature(no_body_run):
    (handles, cc, w, raw), eml = no_body_run
    # flip a bit in the signature input limbs
    cfg = handles.config
    raw2 = dict(raw)
    sig = [int(x) for x in raw2["signature"]]
    sig[0] ^= 1
    raw2["signature"] = [str(x) for x in sig]
    # the advice must be recomputed for the circuit to even *evaluate*; an
    # honest prover cannot produce advice making a wrong signature verify
    inputs = prepare_inputs([raw2], cfg)
    w2 = cc.eval_witness(inputs, 1)
    assert not cc.check_satisfied_device(w2[:, :, 0])


def test_email_verifier_with_body():
    cfg = EmailVerifierConfig(max_headers_length=448, max_body_length=192)
    body = b"Proving the body branch works on TPUs.\r\n"
    eml = SIGNER.sign_email(body=body)
    args = InputGenArgs(max_headers_length=448, max_body_length=192)
    handles, cc, w, raw = build_and_eval(cfg, eml, args)
    assert cc.check_satisfied_device(w[:, :, 0])


def test_email_verifier_with_body_tampered_body():
    cfg = EmailVerifierConfig(max_headers_length=448, max_body_length=192)
    body = b"Original body content here.\r\n"
    eml = SIGNER.sign_email(body=body)
    args = InputGenArgs(max_headers_length=448, max_body_length=192)
    handles = build_email_verifier(cfg)
    cc = handles.cs.compile()
    raw = generate_email_verifier_inputs(eml, SIGNER.resolver(), args)
    # tamper: change a body byte after input generation
    bad = dict(raw)
    eb = [int(x) for x in bad["emailBody"]]
    eb[0] = (eb[0] + 1) % 256
    bad["emailBody"] = [str(x) for x in eb]
    inputs = prepare_inputs([bad], cfg)
    w = cc.eval_witness(inputs, 1)
    assert not cc.check_satisfied_device(w[:, :, 0])


def test_email_verifier_header_masking():
    cfg = EmailVerifierConfig(
        max_headers_length=448,
        max_body_length=192,
        ignore_body_hash_check=True,
        enable_header_masking=True,
    )
    eml = SIGNER.sign_email(body=b"mask test\r\n")
    mask = [1 if i < 32 else 0 for i in range(448)]
    args = InputGenArgs(
        ignore_body_hash_check=True,
        enable_header_masking=True,
        header_mask=mask,
        max_headers_length=448,
        max_body_length=192,
    )
    handles, cc, w, raw = build_and_eval(cfg, eml, args)
    assert cc.check_satisfied_device(w[:, :, 0])
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, 0]))]
    masked = val_of(cc, vals, handles.masked_header)
    header = [int(x) for x in raw["emailHeader"]]
    assert masked[:32] == header[:32]
    assert all(v == 0 for v in masked[32:])


def test_email_verifier_decoy_bh_in_subject_rejected():
    """A second `bh=<44 chars>;` planted in an attacker-controlled Subject
    must NOT be bindable as the body hash: the DFA anchors extraction to the
    `dkim-signature:` header structure (email-verifier.circom:124-131 role),
    so pointing bodyHashIndex at the decoy leaves the reveal window empty and
    the R1CS unsatisfied."""
    cfg = EmailVerifierConfig(max_headers_length=448, max_body_length=192)
    body = b"Body bound to the real hash.\r\n"
    decoy = "bh=" + "A" * 43 + "=;"
    eml = SIGNER.sign_email(subject=f"decoy {decoy} end", body=body)
    args = InputGenArgs(max_headers_length=448, max_body_length=192)
    handles = build_email_verifier(cfg)
    cc = handles.cs.compile()
    raw = generate_email_verifier_inputs(eml, SIGNER.resolver(), args)
    # honest inputs still satisfy (decoy elsewhere is harmless)
    inputs = prepare_inputs([raw], cfg)
    w = cc.eval_witness(inputs, 1)
    assert cc.check_satisfied_device(w[:, :, 0])
    # malicious prover: bind the body check to the decoy's position
    header = bytes(int(x) for x in raw["emailHeader"])
    decoy_idx = header.find(decoy.encode()) + 3
    assert decoy_idx > 2, "decoy must be present in the signed header"
    assert decoy_idx != int(raw["bodyHashIndex"])
    bad = dict(raw)
    bad["bodyHashIndex"] = str(decoy_idx)
    inputs2 = prepare_inputs([bad], cfg)
    w2 = cc.eval_witness(inputs2, 1)
    assert not cc.check_satisfied_device(w2[:, :, 0])


@pytest.mark.slow
def test_email_verifier_reference_test_size_640_768():
    """The reference CI configuration — EmailVerifier(640, 768, 121, 17,
    0,0,0,0) (tests/test-circuits/email-verifier-test.circom) — builds,
    solves, and satisfies the R1CS with the right public outputs."""
    cfg = EmailVerifierConfig(max_headers_length=640, max_body_length=768)
    eml = SIGNER.sign_email(
        subject="full-size config", body=b"reference test size body\r\n"
    )
    args = InputGenArgs(max_headers_length=640, max_body_length=768)
    handles, cc, w, raw = build_and_eval(cfg, eml, args)
    assert cc.n_constraints > 1_000_000  # full-size body-checked regime
    assert cc.check_satisfied_device(w[:, :, 0])
    vals = LB.limbs_to_ints(np.asarray(w[:, :, 0]))
    n, _ = SIGNER.public_key
    assert int(val_of(cc, vals, handles.pubkey_hash)) == poseidon_large(n, 121, 9)


@pytest.mark.slow
def test_email_verifier_default_size_1024_1536_builds():
    """The reference DEFAULT size (constants.ts:2-3) builds with the expected
    constraint structure; witness/prove at this size run on the TPU bench
    (BENCH_CONFIG=full1024)."""
    cfg = EmailVerifierConfig(max_headers_length=1024, max_body_length=1536)
    handles = build_email_verifier(cfg)
    cc = handles.cs.compile()
    # body SHA dominates (~760k at 1536, email-verifier.circom:133); with
    # header SHA + RSA + DFA the full model lands near the reference's ~2M
    assert 1_500_000 < cc.n_constraints < 3_000_000
    assert cc.n_public >= 3  # pubkeyHash, shaHi, shaLo


def test_email_verifier_soft_line_breaks():
    """removeSoftLineBreaks variant (email-verifier.circom:148-156 role;
    reference spec email-verifier-with-soft-line-breaks.test.ts): a QP body
    with '=\\r\\n' soft breaks satisfies the R1CS with the decoded body as a
    public input, and a tampered decoded byte breaks the RLC equality."""
    cfg = EmailVerifierConfig(
        max_headers_length=448, max_body_length=192, remove_soft_line_breaks=True
    )
    body = b"This line is soft-wr=\r\napped with quoted-print=\r\nable breaks.\r\n"
    eml = SIGNER.sign_email(subject="qp soft breaks", body=body)
    args = InputGenArgs(
        max_headers_length=448, max_body_length=192, remove_soft_line_breaks=True
    )
    handles, cc, w, raw = build_and_eval(cfg, eml, args)
    assert cc.check_satisfied_device(w[:, :, 0])
    # the prepared decoded input equals the host-side QP removal
    decoded = [int(x) for x in raw["decodedEmailBodyIn"]]
    expect = bytes(int(x) for x in raw["emailBody"]).replace(b"=\r\n", b"")
    assert bytes(decoded[: len(expect)]) == expect
    # negative: a single wrong decoded byte must violate the RLC equality
    bad = dict(raw)
    dec = [int(x) for x in bad["decodedEmailBodyIn"]]
    dec[0] = (dec[0] + 1) % 256
    bad["decodedEmailBodyIn"] = [str(x) for x in dec]
    inputs2 = prepare_inputs([bad], cfg)
    w2 = cc.eval_witness(inputs2, 1)
    assert not cc.check_satisfied_device(w2[:, :, 0])


def test_email_verifier_body_masking():
    """enableBodyMasking variant (email-verifier.circom:158-166 role;
    reference spec email-verifier-body-masking.test.ts): masked body public
    output equals body*mask, and a non-bit mask value is rejected."""
    cfg = EmailVerifierConfig(
        max_headers_length=448, max_body_length=192, enable_body_masking=True
    )
    body = b"Reveal only the first sentence. Hide the rest of this body.\r\n"
    eml = SIGNER.sign_email(subject="body mask", body=body)
    mask = [1 if i < 31 else 0 for i in range(192)]
    args = InputGenArgs(
        max_headers_length=448,
        max_body_length=192,
        enable_body_masking=True,
        body_mask=mask,
    )
    handles, cc, w, raw = build_and_eval(cfg, eml, args)
    assert cc.check_satisfied_device(w[:, :, 0])
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, 0]))]
    masked = val_of(cc, vals, handles.masked_body)
    body_in = [int(x) for x in raw["emailBody"]]
    assert masked[:31] == body_in[:31]
    assert all(v == 0 for v in masked[31:])
    # negative: mask entries must be bits (ByteMask AssertBit role)
    bad = dict(raw)
    bm = [int(x) for x in bad["bodyMask"]]
    bm[0] = 2
    bad["bodyMask"] = [str(x) for x in bm]
    inputs2 = prepare_inputs([bad], cfg)
    w2 = cc.eval_witness(inputs2, 1)
    assert not cc.check_satisfied_device(w2[:, :, 0])


@pytest.mark.slow
def test_email_verifier_qp_selector_1408():
    """The reference QP configuration — EmailVerifier(640, 1408, 121, 17,
    0, 0, 0, 1) with shaPrecomputeSelector (test-circuits/email-verifier-
    qp-test.circom; email-verifier.test.ts:51 uses "How are"): the selector
    is itself split by a soft line break, the partial-SHA midstate elides
    the prefix, and the decoded body satisfies the RLC check."""
    cfg = EmailVerifierConfig(
        max_headers_length=640, max_body_length=1408, remove_soft_line_breaks=True
    )
    prefix = b"Hello there!\r\n" + b"Filler line for the precompute prefix.\r\n" * 4
    # the selector "How are" lands split across a QP soft break
    body = prefix + b"How a=\r\nre you doing today?\r\nFine thanks to partial SHA.\r\n"
    eml = SIGNER.sign_email(subject="qp selector", body=body)
    args = InputGenArgs(
        max_headers_length=640,
        max_body_length=1408,
        remove_soft_line_breaks=True,
        sha_precompute_selector="How are",
    )
    handles, cc, w, raw = build_and_eval(cfg, eml, args)
    # the precompute actually elided a non-empty prefix
    assert any(int(x) != 0 for x in raw["precomputedSHA"][:8])
    assert int(raw["emailBodyLength"]) < len(body) + 65
    assert cc.check_satisfied_device(w[:, :, 0])
    # negative: tampering the midstate breaks the digest equality
    bad = dict(raw)
    ps = [int(x) for x in bad["precomputedSHA"]]
    ps[0] ^= 1
    bad["precomputedSHA"] = [str(x) for x in ps]
    inputs2 = prepare_inputs([bad], cfg)
    w2 = cc.eval_witness(inputs2, 1)
    assert not cc.check_satisfied_device(w2[:, :, 0])
