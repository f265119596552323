"""DoH resolver semantics: retries, cross-check warning, union.

Mirrors the reference's dual-provider DoH behavior
(/root/reference/packages/helpers/src/dkim/dns-over-http.ts:109-142)
without network: urlopen is monkeypatched per test.
"""

import io
import json
import logging

import pytest

from zkemail_tpu.helpers import dns as D

def _txt():
    import base64

    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.hazmat.primitives.serialization import (
        Encoding,
        PublicFormat,
    )

    pub = rsa.generate_private_key(public_exponent=65537, key_size=1024).public_key()
    der = pub.public_bytes(Encoding.DER, PublicFormat.SubjectPublicKeyInfo)
    return "v=DKIM1; k=rsa; p=" + base64.b64encode(der).decode()


TXT_A = _txt()
TXT_B = _txt()


def _resp(txts):
    body = json.dumps(
        {"Answer": [{"type": 16, "data": t} for t in txts]}
    ).encode()

    class R(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    return R(body)


def _patch(monkeypatch, handler):
    calls = []

    def fake_urlopen(req, timeout=None):
        url = req.full_url if hasattr(req, "full_url") else str(req)
        calls.append(url)
        return handler(url, len(calls))

    monkeypatch.setattr(D.urllib.request, "urlopen", fake_urlopen)
    return calls


def test_doh_union_and_no_warning_on_agreement(monkeypatch, caplog):
    _patch(monkeypatch, lambda url, n: _resp([TXT_A]))
    r = D.DoHResolver(providers=["https://p1/?name={name}", "https://p2/?name={name}"])
    with caplog.at_level(logging.WARNING, logger="zkemail_tpu.helpers.dns"):
        keys = r("example.com", "sel")
    assert len(keys) == 1
    assert not [rec for rec in caplog.records if "cross-check" in rec.message]


def test_doh_cross_check_mismatch_prefers_first_provider(monkeypatch, caplog):
    """Reference behavior (dns-over-http.ts:128-130): on mismatch, trust the
    first answering provider; warn about the disagreement."""

    def handler(url, n):
        return _resp([TXT_A] if "p1" in url else [TXT_B])

    _patch(monkeypatch, handler)
    r = D.DoHResolver(providers=["https://p1/?name={name}", "https://p2/?name={name}"])
    with caplog.at_level(logging.WARNING, logger="zkemail_tpu.helpers.dns"):
        keys = r("example.com", "sel")
    assert len(keys) == 1
    assert keys == [D.parse_dkim_txt(TXT_A)]
    assert any("cross-check mismatch" in rec.message for rec in caplog.records)


def test_doh_cross_check_mismatch_union_opt_in(monkeypatch, caplog):
    def handler(url, n):
        return _resp([TXT_A] if "p1" in url else [TXT_B])

    _patch(monkeypatch, handler)
    r = D.DoHResolver(
        providers=["https://p1/?name={name}", "https://p2/?name={name}"],
        union_on_mismatch=True,
    )
    with caplog.at_level(logging.WARNING, logger="zkemail_tpu.helpers.dns"):
        keys = r("example.com", "sel")
    assert len(keys) == 2
    assert any("cross-check mismatch" in rec.message for rec in caplog.records)


def test_doh_retries_then_succeeds(monkeypatch):
    state = {"fails": 0}

    def handler(url, n):
        if state["fails"] < 1:
            state["fails"] += 1
            raise OSError("transient")
        return _resp([TXT_A])

    _patch(monkeypatch, handler)
    r = D.DoHResolver(providers=["https://p1/?name={name}"], retries=2)
    keys = r("example.com", "sel")
    assert len(keys) == 1


def test_doh_unreachable_provider_is_skipped_silently(monkeypatch, caplog):
    def handler(url, n):
        if "p1" in url:
            raise OSError("down")
        return _resp([TXT_A])

    _patch(monkeypatch, handler)
    r = D.DoHResolver(
        providers=["https://p1/?name={name}", "https://p2/?name={name}"], retries=2
    )
    with caplog.at_level(logging.WARNING, logger="zkemail_tpu.helpers.dns"):
        keys = r("example.com", "sel")
    assert len(keys) == 1
    # an unreachable provider is not a cross-check mismatch
    assert not [rec for rec in caplog.records if "cross-check" in rec.message]
