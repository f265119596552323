"""End-to-end runs on the reference's bundled .eml fixtures — hermetic.

Mirrors /root/reference/packages/helpers/tests/dkim.test.ts on the real
fixture emails (test-data/*.eml). The reference resolves the icloud.com
1a1hai key over live DNS/archive; here it comes from
tests/fixtures/dkim_keys.json, recovered offline from the signatures
themselves (zkemail_tpu/helpers/key_recovery.py).
"""

import json
from pathlib import Path

import pytest

from zkemail_tpu.helpers.dkim import (
    DKIMError,
    parse_message,
    verify_dkim_signature,
)
from zkemail_tpu.helpers.dns import StaticResolver
from zkemail_tpu.helpers.key_recovery import recover_modulus

REF = Path("/root/reference/packages/helpers/tests/test-data")
FIXTURE_KEYS = json.loads(
    (Path(__file__).parent / "fixtures/dkim_keys.json").read_text()
)


def resolver():
    table = {}
    for key, val in FIXTURE_KEYS.items():
        domain, selector = key.split(":")
        table[(domain, selector)] = [(int(val["n"]), int(val["e"]))]
    return StaticResolver(table)


def read(name: str) -> bytes:
    return (REF / name).read_bytes()


def test_good_email_verifies():
    res = verify_dkim_signature(read("email-good.eml"), resolver())
    assert res.signing_domain == "icloud.com"
    assert res.selector == "1a1hai"
    assert not res.applied_sanitization


def test_good_large_email_verifies():
    res = verify_dkim_signature(read("email-good-large.eml"), resolver())
    assert res.signing_domain == "icloud.com"
    assert res.modulus_length == 2048


def test_invalid_selector_fails_no_key():
    with pytest.raises(DKIMError) as exc:
        verify_dkim_signature(read("email-invalid-selector.eml"), resolver())
    assert exc.value.code == "ENODATA"


def test_tampered_body_fails_body_hash():
    with pytest.raises(DKIMError) as exc:
        verify_dkim_signature(read("email-body-tampered.eml"), resolver())
    assert exc.value.code == "EBODYHASH"


def test_invalid_domain_fails():
    """From: is user@gmail.com but the signature is only for icloud.com —
    must NOT verify against the From domain (dkim.test.ts:45-56)."""
    with pytest.raises(DKIMError) as exc:
        verify_dkim_signature(read("email-invalid-domain.eml"), resolver())
    assert exc.value.code == "ENOSIG"
    assert "gmail.com" in str(exc.value)


def test_domain_override():
    """Default (From) domain verifies; an overridden domain with no matching
    signature fails (dkim.test.ts:58-74)."""
    eml = read("email-different-domain.eml")
    verify_dkim_signature(eml, resolver())
    with pytest.raises(DKIMError):
        verify_dkim_signature(eml, resolver(), domain="domain.com")


def test_bodyless_email_skip_body_hash():
    res = verify_dkim_signature(
        read("email-bodyless.eml"), resolver(), skip_body_hash=True
    )
    assert res.signing_domain == "icloud.com"


def test_tampered_body_passes_with_skip_body_hash():
    res = verify_dkim_signature(
        read("email-body-tampered.eml"), resolver(), skip_body_hash=True
    )
    assert res.signing_domain == "icloud.com"


def test_multi_dkim_sig_discovered():
    """multi-dkim-sig.eml carries two signatures (hubspotstarter + starknet);
    both must be discovered; without keys for either domain the error names
    the missing key rather than ENOSIG."""
    raw = read("multi-dkim-sig.eml")
    parsed = parse_message(raw)
    sigs = [h for h in parsed.headers if h[0] == "dkim-signature"]
    assert len(sigs) == 2
    with pytest.raises(DKIMError) as exc:
        verify_dkim_signature(raw, resolver(), domain="starknet.org")
    assert exc.value.code in ("ENODATA", "EBODYHASH")


def test_key_recovery_roundtrip():
    """The checked-in fixture key is reproducible from the signatures."""
    n = recover_modulus(
        [read("email-good.eml"), read("email-good-large.eml")]
    )
    assert str(n) == FIXTURE_KEYS["icloud.com:1a1hai"]["n"]


def test_circuits_test_eml_same_key():
    """The circuits package's test.eml is signed by the same icloud key —
    the key fixture covers the reference's circuit-test email too."""
    eml = Path(
        "/root/reference/packages/circuits/tests/test-emails/test.eml"
    ).read_bytes()
    res = verify_dkim_signature(eml, resolver())
    assert res.signing_domain == "icloud.com"


def test_witness_inputs_from_reference_email():
    """generateEmailVerifierInputs on the reference test.eml at the reference
    test config (640/768) — the input-generators.test.ts role."""
    from zkemail_tpu.helpers.input_gen import (
        InputGenArgs,
        generate_email_verifier_inputs,
    )

    eml = Path(
        "/root/reference/packages/circuits/tests/test-emails/test.eml"
    ).read_bytes()
    raw = generate_email_verifier_inputs(
        eml,
        resolver(),
        InputGenArgs(max_headers_length=640, max_body_length=768),
    )
    assert len(raw["emailHeader"]) == 640
    assert len(raw["pubkey"]) == 17 and len(raw["signature"]) == 17
    assert int(raw["emailHeaderLength"]) % 64 == 0
    assert "bodyHashIndex" in raw and "precomputedSHA" in raw
