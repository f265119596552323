"""mailauth tools parity: alignment, Authentication-Results, algorithm tag.

Oracle: packages/helpers/src/lib/mailauth/tools.ts:380-511 semantics.
"""

import pytest

from zkemail_tpu.helpers.tools import (
    escape_comment_value,
    escape_prop_value,
    format_auth_header_row,
    format_domain,
    get_alignment,
    psl_get,
    validate_algorithm,
)


def test_psl_get_org_domains():
    assert psl_get("mail.google.com") == "google.com"
    assert psl_get("google.com") == "google.com"
    assert psl_get("a.b.co.uk") == "b.co.uk"
    assert psl_get("news.bbc.co.uk") == "bbc.co.uk"
    assert psl_get("com") is None
    assert psl_get("co.uk") is None
    assert psl_get("") is None


def test_get_alignment_relaxed_and_strict():
    # relaxed: org domains match
    assert get_alignment("mail.example.com", ["example.com"]) == "example.com"
    assert get_alignment("example.com", ["mailer.example.com"]) == "example.com"
    assert get_alignment("example.com", ["other.org"]) is False
    # strict: exact domain equality first
    assert get_alignment("sub.example.com", ["sub.example.com"], strict=True)
    # strict falls back to org-domain matching (tools.ts:477-486)
    assert get_alignment("sub.example.com", ["example.com"], strict=True) == "example.com"
    # co.uk handling
    assert get_alignment("news.bbc.co.uk", ["www.bbc.co.uk"]) == "bbc.co.uk"
    assert get_alignment("news.bbc.co.uk", ["bbc2.co.uk"]) is False


def test_format_domain_punycode():
    assert format_domain("EXAMPLE.Com ") == "example.com"
    assert format_domain("bücher.example") == "xn--bcher-kva.example"


def test_auth_header_row():
    row = format_auth_header_row(
        "dkim",
        {
            "result": "pass",
            "comment": "body hash ok)",
            "header": {"i": "@example.com", "s": "sel1", "a": "rsa-sha256", "b": ""},
        },
    )
    assert row == (
        "dkim=pass (body hash ok\\)) header.i=@example.com "
        "header.s=sel1 header.a=rsa-sha256"
    )
    assert format_auth_header_row("dkim", None) == "dkim=none"


def test_escape_prop_value_quoting():
    assert escape_prop_value("simple-token") == "simple-token"
    assert escape_prop_value("has space") == '"has space"'
    assert escape_prop_value('q"uote') == '"q\\"uote"'
    assert escape_comment_value("a)b\\c") == "a\\)b\\\\c"


def test_validate_algorithm():
    validate_algorithm("rsa-sha256")
    validate_algorithm("ed25519-sha256")
    validate_algorithm("rsa-sha1")  # allowed when not strict
    with pytest.raises(ValueError):
        validate_algorithm("rsa-sha1", strict=True)
    with pytest.raises(ValueError):
        validate_algorithm("dsa-sha256")
    with pytest.raises(ValueError):
        validate_algorithm("rsasha256")
    try:
        validate_algorithm("rsa-md5")
    except ValueError as exc:
        assert exc.code == "EINVALIDALGO"


def test_dkim_result_carries_auth_results():
    from zkemail_tpu.helpers.dkim import verify_dkim_signature
    from zkemail_tpu.helpers.testkit import LocalDKIMSigner

    signer = LocalDKIMSigner()
    eml = signer.sign_email(body=b"hello auth results\r\n")
    res = verify_dkim_signature(eml, signer.resolver())
    assert res.auth_results.startswith("dkim=pass")
    assert f"header.s={res.selector}" in res.auth_results
    # relaxed alignment yields the organizational domain of d=
    assert res.status["aligned"] == psl_get(res.signing_domain)


def test_parse_tags_state_machine():
    """Adversarial tag lists through the headerParser state machine
    (parse-dkim-headers.ts:146-260): quoted ';', comments, escapes, FWS."""
    from zkemail_tpu.helpers.dkim import parse_tags, parse_tags_full

    # a ';' inside a quoted value must NOT split the part
    tags = parse_tags(b'v=1; x="a;b"; d=example.com')
    assert tags["x"] == "a;b"
    assert tags["d"] == "example.com"
    # RFC 5322 comment: stripped from the value, captured separately
    parts = parse_tags_full(b"v=1; s=sel (primary selector); d=example.com")
    by_key = {p["key"]: p for p in parts}
    assert by_key["s"]["value"] == "sel"
    assert by_key["s"]["comment"] == "primary selector"
    # a ';' inside a comment does not split either
    tags = parse_tags(b"v=1; s=sel (a;b); d=example.com")
    assert tags["s"] == "sel" and tags["d"] == "example.com"
    # backslash escape protects a ';'
    assert parse_tags(rb"v=1; z=from:a\;b; d=e.com")["z"] == "from:a;b"
    # folded b= value: whitespace fully removed for b/bh/p/h
    folded = b"v=1; b=AAAA\r\n\tBBBB CC\r\n CC; bh=Zm9v\r\n\tYmFy"
    tags = parse_tags(folded)
    assert tags["b"] == "AAAABBBBCCCC"
    assert tags["bh"] == "Zm9vYmFy"
    # other values: internal FWS collapses to single spaces
    assert parse_tags(b"v=1; h=from :\r\n\tto : subject")["h"] == "from:to:subject"
    # z= copy-headers survive with their pipe separators
    z = parse_tags(b"v=1; z=From:a@e.com|To:b@e.com")["z"]
    assert z == "From:a@e.com|To:b@e.com"
    # later duplicate keys win (reference result[key] overwrite)
    assert parse_tags(b"v=1; s=one; s=two")["s"] == "two"
    # empty parts / trailing ';' are dropped
    assert "" not in parse_tags(b"v=1;; d=e.com;")


def test_signature_version_error_code():
    """v= other than 1 -> EINVALIDVER (dkim-verifier.ts:325)."""
    from zkemail_tpu.helpers.dkim import DKIMError, verify_dkim_signature
    from zkemail_tpu.helpers.testkit import LocalDKIMSigner

    signer = LocalDKIMSigner()
    eml = signer.sign_email(body=b"versioned\r\n")
    bad = eml.replace(b"v=1;", b"v=2;", 1)
    with pytest.raises(DKIMError) as exc:
        verify_dkim_signature(bad, signer.resolver())
    assert exc.value.code == "EINVALIDVER"


def test_key_record_error_taxonomy():
    """DNS key-record parsing raises the reference codes
    (tools.ts processPublicKey:301-387)."""
    from zkemail_tpu.helpers.dkim import DKIMError
    from zkemail_tpu.helpers.dns import parse_dkim_txt

    with pytest.raises(DKIMError) as exc:
        parse_dkim_txt("v=DKIM2; k=rsa; p=AAAA", strict=True)
    assert exc.value.code == "EINVALIDVER"
    # ed25519 keys now PARSE (RFC 8463 raw 32-byte form) — host-side
    # verification covers them; malformed ed25519 material is a VALUE error
    import base64 as _b64

    raw32 = _b64.b64encode(bytes(range(32))).decode()
    assert parse_dkim_txt(f"v=DKIM1; k=ed25519; p={raw32}") == (
        "ed25519",
        bytes(range(32)),
    )
    with pytest.raises(DKIMError) as exc:
        parse_dkim_txt("v=DKIM1; k=ed25519; p=AAAA", strict=True)
    assert exc.value.code == "EINVALIDVAL"
    with pytest.raises(DKIMError) as exc:
        parse_dkim_txt("v=DKIM1; k=dsa; p=AAAA", strict=True)
    assert exc.value.code == "EINVALIDTYPE"
    with pytest.raises(DKIMError) as exc:
        parse_dkim_txt("v=DKIM1; k=rsa; p=", strict=True)
    assert exc.value.code == "EINVALIDVAL"
    with pytest.raises(DKIMError) as exc:
        parse_dkim_txt("v=DKIM1; k=rsa; p=!!notbase64!!", strict=True)
    assert exc.value.code == "EINVALIDVAL"
    # non-strict keeps the lenient contract for crawler-style callers
    assert parse_dkim_txt("v=DKIM1; k=ed25519; p=AAAA") is None
