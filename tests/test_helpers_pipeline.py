"""Host email pipeline tests: SHA midstate, canonicalization, DKIM, input gen.

Parity oracles: hashlib for SHA; self-signed DKIM emails round-trip through
the verifier; canonicalization checked on the reference's bundled .eml
fixtures (read in place from /root/reference, DNS-free checks only).
"""

import base64
import hashlib
from pathlib import Path

import pytest

from zkemail_tpu.helpers import sha_utils as SU
from zkemail_tpu.helpers.binary_format import (
    chunks_to_big_int,
    pack_bytes_to_fields,
    packed_to_string,
    to_circom_bigint,
)
from zkemail_tpu.helpers.canon import canon_body_relaxed, canon_body_simple
from zkemail_tpu.helpers.dkim import (
    DKIMError,
    parse_message,
    rsa_sha256_verify,
    verify_dkim_signature,
)
from zkemail_tpu.helpers.input_gen import (
    InputGenArgs,
    generate_email_verifier_inputs,
    get_adjusted_selector,
    remove_soft_line_breaks_str,
)
from zkemail_tpu.helpers.testkit import LocalDKIMSigner

REF_DATA = Path("/root/reference/packages/helpers/tests/test-data")


def test_sha256_matches_hashlib():
    for msg in [b"", b"abc", b"a" * 63, b"b" * 64, b"c" * 1000]:
        assert SU.sha256(msg) == hashlib.sha256(msg).digest()


def test_sha256_pad_shapes():
    padded, plen = SU.sha256_pad(b"abc", 128)
    assert len(padded) == 128 and plen == 64
    assert padded[3] == 0x80
    # round-trip: compressing plen bytes gives the digest
    assert SU.state_to_bytes(SU.sha256_state(padded[:plen])) == hashlib.sha256(b"abc").digest()


def test_partial_sha_midstate():
    data = b"x" * 128 + b"SELECTOR" + b"y" * 200
    padded, plen = SU.sha256_pad(data, 448)
    pre, remaining, rem_len = SU.generate_partial_sha(padded, plen, "SELECTOR", 384)
    # resuming from the midstate over the remaining bytes equals the full hash
    state2 = SU.sha256_state(remaining[:rem_len], SU.bytes_to_state(pre))
    assert SU.state_to_bytes(state2) == hashlib.sha256(data).digest()


def test_bigint_chunking():
    x = 0xDEADBEEF << 1900 | 12345
    limbs = to_circom_bigint(x)
    assert len(limbs) == 17
    assert chunks_to_big_int(limbs, 121) == x


def test_pack_bytes_roundtrip():
    s = b"hello@zkemail-on-tpu.example"
    fields = pack_bytes_to_fields(s)
    assert packed_to_string(fields) == s.decode()


def test_canon_body():
    assert canon_body_relaxed(b"Hi  there \t \r\nline2\r\n\r\n\r\n") == b"Hi there\r\nline2\r\n"
    assert canon_body_simple(b"abc\r\n\r\n\r\n") == b"abc\r\n"
    assert canon_body_relaxed(b"") == b""
    assert canon_body_simple(b"") == b"\r\n"


def test_dkim_roundtrip_and_negatives():
    mailer = LocalDKIMSigner()
    eml = mailer.sign_email()
    res = verify_dkim_signature(eml, mailer.resolver())
    assert res.signing_domain == mailer.domain
    assert res.public_key == mailer.public_key
    assert res.status["result"] == "pass"
    # signature base must contain the canonicalized from: header
    assert b"from:" in res.headers
    # body hash is in the signed headers (needed by the circuit)
    assert res.body_hash.encode() in res.headers

    # tampered body -> body hash error
    bad = eml.replace(b"test body", b"evil body")
    with pytest.raises(DKIMError) as exc:
        verify_dkim_signature(bad, mailer.resolver(), enable_sanitization=False)
    assert exc.value.code == "EBODYHASH"

    # tampered subject -> bad signature
    bad2 = eml.replace(b"Hello from", b"Byebye from")
    with pytest.raises(DKIMError) as exc2:
        verify_dkim_signature(bad2, mailer.resolver(), enable_sanitization=False)
    assert exc2.value.code == "EBADSIG"

    # wrong key -> bad signature
    other = LocalDKIMSigner()
    with pytest.raises(DKIMError):
        verify_dkim_signature(eml, other.resolver(), enable_sanitization=False)


def test_dkim_simple_canon():
    mailer = LocalDKIMSigner()
    eml = mailer.sign_email(canon="simple/simple")
    res = verify_dkim_signature(eml, mailer.resolver())
    assert res.format == "simple/simple"


def test_sanitizer_recovers_bare_lf():
    # bare-LF emails are repaired by parse-time normalization (ensureLinebreaks)
    mailer = LocalDKIMSigner()
    eml = mailer.sign_email()
    mangled = eml.replace(b"\r\n", b"\n")
    res = verify_dkim_signature(mangled, mailer.resolver())
    assert res.status["result"] == "pass"


def test_sanitizer_removes_subject_labels():
    mailer = LocalDKIMSigner()
    eml = mailer.sign_email(subject="Hello from the TPU prover")
    mangled = eml.replace(b"Subject: Hello", b"Subject: [ext] Hello", 1)
    res = verify_dkim_signature(mangled, mailer.resolver())
    assert res.applied_sanitization == "remove_labels"


def test_input_generation():
    mailer = LocalDKIMSigner()
    eml = mailer.sign_email()
    inputs = generate_email_verifier_inputs(
        eml, mailer.resolver(), InputGenArgs(max_headers_length=768, max_body_length=768)
    )
    assert len(inputs["emailHeader"]) == 768
    assert len(inputs["pubkey"]) == 17
    assert len(inputs["signature"]) == 17
    assert int(inputs["emailHeaderLength"]) % 64 == 0
    assert len(inputs["emailBody"]) == 768
    assert len(inputs["precomputedSHA"]) == 32
    # bodyHashIndex points at the bh= value inside the header
    res = verify_dkim_signature(eml, mailer.resolver())
    idx = int(inputs["bodyHashIndex"])
    got = bytes(int(b) for b in inputs["emailHeader"][idx : idx + 44]).decode()
    assert got == res.body_hash
    # pubkey limbs recombine to the modulus
    n = chunks_to_big_int([int(x) for x in inputs["pubkey"]], 121)
    assert n == mailer.public_key[0]


def test_input_generation_with_precompute_selector():
    mailer = LocalDKIMSigner()
    body = b"A" * 200 + b"ZKEMAIL_SELECTOR" + b"B" * 100 + b"\r\n"
    eml = mailer.sign_email(body=body)
    inputs = generate_email_verifier_inputs(
        eml,
        mailer.resolver(),
        InputGenArgs(
            max_headers_length=768,
            max_body_length=320,
            sha_precompute_selector="ZKEMAIL_SELECTOR",
        ),
    )
    # remaining body must be shorter than the full body and hash must resume
    assert int(inputs["emailBodyLength"]) <= 320


def test_soft_line_break_removal():
    body = [str(b) for b in b"ab=\r\ncd"]
    out = remove_soft_line_breaks_str(body)
    assert [chr(int(x)) for x in out[:4]] == list("abcd")
    assert out[4:] == ["0", "0", "0"]


def test_adjusted_selector():
    body = b"xxxSEL=\r\nECTORyyy"
    assert get_adjusted_selector("SELECTOR", body) == "SEL=\r\nECTOR"


def test_rsa_verify_against_cryptography():
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    msg = b"attack at dawn"
    sig = key.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    nums = key.public_key().public_numbers()
    assert rsa_sha256_verify(nums.n, nums.e, int.from_bytes(sig, "big"), msg)
    assert not rsa_sha256_verify(nums.n, nums.e, int.from_bytes(sig, "big"), b"other")


@pytest.mark.skipif(not REF_DATA.exists(), reason="reference repo not mounted")
def test_reference_fixture_parses():
    """DNS-free checks on the reference's bundled fixture: parse + body-hash."""
    raw = (REF_DATA / "email-good.eml").read_bytes()
    parsed = parse_message(raw)
    names = [h[0] for h in parsed.headers]
    assert "dkim-signature" in names
    from zkemail_tpu.helpers.dkim import parse_tags
    from zkemail_tpu.helpers.canon import canon_body

    sig = next(h for h in parsed.headers if h[0] == "dkim-signature")
    tags = parse_tags(sig[2])
    assert tags.get("a") == "rsa-sha256"
    body_canon = canon_body(parsed.body, tags.get("c", "simple/simple").split("/")[-1], None)
    bh = base64.b64encode(hashlib.sha256(body_canon).digest()).decode()
    assert bh == tags["bh"], "reference fixture body hash must reproduce"


def test_legacy_ecdsa_build_input():
    """buildInput parity (chunked-zkey.ts:107-147): uncompressed pubkey /
    sig hex split into 4x64-bit little-endian limb arrays."""
    from zkemail_tpu.helpers.binary_format import build_ecdsa_input

    x = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
    y = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
    r_v = 0x00A1B2C3D4E5F60718293A4B5C6D7E8F90A1B2C3D4E5F60718293A4B5C6D7E8F
    s_v = 0x0123456789ABCDEF0123456789ABCDEF0123456789ABCDEF0123456789ABCDEF
    pk_hex = "0x04" + format(x, "064x") + format(y, "064x")
    sig_hex = "0x" + format(r_v, "064x") + format(s_v, "064x") + "1b"
    h = 0xDEADBEEF

    inp = build_ecdsa_input(pk_hex, hex(h), sig_hex)
    mask = (1 << 64) - 1

    def recompose(arr):
        return sum(int(v) << (64 * i) for i, v in enumerate(arr))

    assert recompose(inp["pubkey"][0]) == x
    assert recompose(inp["pubkey"][1]) == y
    assert recompose(inp["r"]) == r_v
    assert recompose(inp["s"]) == s_v
    assert recompose(inp["msghash"]) == h
    assert int(inp["r"][0]) == r_v & mask  # little-endian limb order


def test_ed25519_dkim_host_verification():
    """RFC 8463 ed25519-sha256 host-side verification parity (mailauth
    tools.ts:266-376, dkim-verifier.ts:272-277): the signature verifies and
    is reported valid-but-unprovable; the circuit input bridge rejects it
    with a clear error; a tampered message fails with EBADSIG."""
    from zkemail_tpu.helpers.dkim import (
        DKIMError,
        verify_dkim_signature,
    )
    from zkemail_tpu.helpers.dns import parse_dkim_txt
    from zkemail_tpu.helpers.input_gen import (
        generate_email_verifier_inputs_from_dkim,
    )
    from zkemail_tpu.helpers.testkit import LocalEd25519DKIMSigner

    signer = LocalEd25519DKIMSigner()
    eml = signer.sign_email(subject="ed25519 parity")
    res = verify_dkim_signature(eml, signer.resolver())
    assert res.algo == "ed25519-sha256"
    assert res.circuit_provable is False
    assert res.status["result"] == "pass"
    assert res.public_key[0] == "ed25519"
    assert res.modulus_length == 256

    # the circuit cannot prove it: the bridge must say so, loudly
    with pytest.raises(ValueError, match="cannot prove"):
        generate_email_verifier_inputs_from_dkim(res)

    # tamper -> EBADSIG (body hash guarded separately)
    bad = eml.replace(b"ed25519 parity", b"ed25519 parityX")
    with pytest.raises(DKIMError):
        verify_dkim_signature(bad, signer.resolver())

    # the published TXT record parses back to the same raw key
    parsed = parse_dkim_txt(signer.dns_txt_record())
    assert parsed == signer.public_key
