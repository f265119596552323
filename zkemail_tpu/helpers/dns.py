"""DKIM public-key resolvers.

Mirrors the reference's resolver stack — DNS-over-HTTPS against Google +
Cloudflare with cross-checking (packages/helpers/src/dkim/dns-over-http.ts),
the ZK Email archive fallback (dns-archive.ts), and their merged union
(dkim/index.ts:105-131) — plus a StaticResolver for hermetic tests (the
equivalent of the reference's jest DNS mocks).

All resolvers return a list of (modulus, exponent) RSA keys.
"""

from __future__ import annotations

import base64
import json
import logging
import re
import urllib.request

logger = logging.getLogger(__name__)

DOH_PROVIDERS = [
    "https://dns.google/resolve?name={name}&type=TXT",
    "https://cloudflare-dns.com/dns-query?name={name}&type=TXT",
]
ARCHIVE_URL = "https://archive.prove.email/api/key?domain={domain}"


def parse_dkim_txt(txt: str, strict: bool = False):
    """Parse a DKIM TXT record: k=rsa; p=<base64 SubjectPublicKeyInfo>.

    RSA records return (n, e) ints; ed25519 records (RFC 8463: p= is the
    raw 32-byte public key, though SPKI-wrapped keys occur in the wild)
    return ("ed25519", raw_32_bytes) — host verification supports both key
    types like the reference's mailauth (tools.ts:266-376), and the
    RSA-only restriction is applied downstream by the CIRCUIT input
    bridge, which reports ed25519-verified mail as unprovable.

    strict=True raises the reference's key-record error taxonomy
    (mailauth tools.ts processPublicKey:301-387) instead of returning None:
    EINVALIDVAL (missing/undecodable p=), EINVALIDVER (v= present and not
    DKIM1), EINVALIDTYPE (k= not a known type).
    """
    from .dkim import DKIMError

    def fail(code, msg):
        if strict:
            raise DKIMError(code, msg)
        return None

    txt = txt.strip().strip('"').replace('" "', "").replace('""', "")
    tags = {}
    for part in txt.split(";"):
        if "=" in part:
            k, v = part.split("=", 1)
            tags[k.strip().lower()] = v.strip()
    if "v" in tags and tags["v"].strip().lower() != "dkim1":
        return fail("EINVALIDVER", f"unknown key version {tags['v']!r}")
    ktype = tags.get("k", "rsa").strip().lower()
    if ktype not in ("rsa", "ed25519"):
        return fail("EINVALIDTYPE", f"unknown key type {ktype!r}")
    p = tags.get("p", "")
    if not p:
        return fail("EINVALIDVAL", "missing key value")
    try:
        der = base64.b64decode(re.sub(r"\s+", "", p) + "==")
        if ktype == "ed25519":
            return ("ed25519", _ed25519_raw_key(der))
        return _rsa_from_spki(der)
    except DKIMError:
        raise
    except Exception as exc:  # bad base64 / DER
        return fail("EINVALIDVAL", f"invalid public key: {exc}")


def _ed25519_raw_key(blob: bytes) -> bytes:
    """Raw 32-byte Ed25519 public key from p= material (RFC 8463 raw form,
    or an SPKI wrapper as some DNS operators publish)."""
    if len(blob) == 32:
        return blob
    from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PublicKey
    from cryptography.hazmat.primitives.serialization import (
        Encoding, PublicFormat, load_der_public_key,
    )

    key = load_der_public_key(blob)
    if not isinstance(key, Ed25519PublicKey):
        raise ValueError(f"k=ed25519 but key material is {type(key).__name__}")
    return key.public_bytes(Encoding.Raw, PublicFormat.Raw)


def _rsa_from_spki(der: bytes) -> tuple[int, int]:
    """Extract (n, e) from an ASN.1 SubjectPublicKeyInfo (or PKCS#1) blob."""
    from cryptography.hazmat.primitives.asymmetric.rsa import RSAPublicKey
    from cryptography.hazmat.primitives.serialization import load_der_public_key

    key = load_der_public_key(der)
    if not isinstance(key, RSAPublicKey):
        from .dkim import DKIMError

        # e.g. an ed25519 SPKI with no k= tag: reject with the TYPE code
        # (tools.ts:363), not as a value-parse accident
        raise DKIMError(
            "EINVALIDTYPE", f"{type(key).__name__} key (circuit proves rsa only)"
        )
    nums = key.public_numbers()
    return (nums.n, nums.e)


class StaticResolver:
    """Hermetic resolver for tests / air-gapped runs: {(domain, selector): [keys]}"""

    def __init__(self, table: dict):
        self.table = {
            (d.lower(), s.lower()): v if isinstance(v, list) else [v]
            for (d, s), v in table.items()
        }

    def __call__(self, domain: str, selector: str):
        return self.table.get((domain.lower(), selector.lower()), [])


class DoHResolver:
    """resolve via DNS-over-HTTPS (requires network egress).

    Mirrors the reference's dual-provider semantics
    (dns-over-http.ts:109-142): each provider is queried (with per-provider
    retries) and providers that both answer are cross-checked.  On a
    mismatch the reference prefers the FIRST provider's record
    (dns-over-http.ts:128-130) — so do we, logging a warning; the ordered
    union across agreeing providers is returned otherwise.  Set
    ``union_on_mismatch=True`` to opt into unioning even mismatched answers
    (more keys for the multi-key trial loop, at the cost of trusting every
    provider individually).
    """

    def __init__(
        self,
        providers=None,
        timeout: float = 10.0,
        retries: int = 1,
        union_on_mismatch: bool = False,
    ):
        self.providers = providers or DOH_PROVIDERS
        self.timeout = timeout
        self.retries = retries  # extra attempts after the first
        self.union_on_mismatch = union_on_mismatch
        self._last_key_error = None

    def _query(self, tmpl: str, name: str) -> list | None:
        """One provider, with `retries` retries after the first attempt.
        None = provider unreachable."""
        last = None
        for _ in range(1 + max(0, self.retries)):
            try:
                req = urllib.request.Request(
                    tmpl.format(name=name), headers={"accept": "application/dns-json"}
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    data = json.loads(resp.read())
                keys = []
                for ans in data.get("Answer", []) or []:
                    # strict parse: remember the taxonomy error (EINVALIDVER/
                    # EINVALIDTYPE/EINVALIDVAL) but keep trying other records
                    # — key-rotation sets often mix good and bad records
                    # (tools.ts getPublicKey:277-299)
                    try:
                        parsed = parse_dkim_txt(ans.get("data", ""), strict=True)
                    except Exception as exc:
                        self._last_key_error = exc
                        parsed = None
                    if parsed:
                        keys.append(parsed)
                return keys
            except Exception as exc:  # noqa: BLE001 — provider fallback by design
                last = exc
        logger.debug("DoH provider %s failed after retries: %s", tmpl, last)
        return None

    def __call__(self, domain: str, selector: str):
        name = f"{selector}._domainkey.{domain}"
        self._last_key_error = None
        per_provider = [(t, self._query(t, name)) for t in self.providers]
        answered = [(t, ks) for t, ks in per_provider if ks is not None]
        # cross-check: two providers that both answered should agree
        # (dns-over-http.ts cross-verification); a mismatch may indicate a
        # poisoned or stale resolver.  Reference behavior on mismatch is to
        # trust the first answering provider (dns-over-http.ts:128-130);
        # union-on-mismatch is an explicit opt-in.
        mismatch = any(
            set(answered[i][1]) != set(answered[j][1])
            for i in range(len(answered))
            for j in range(i + 1, len(answered))
        )
        if mismatch:
            logger.warning(
                "DoH cross-check mismatch for %s across %s%s",
                name,
                [t for t, _ in answered],
                "" if self.union_on_mismatch else "; using first provider only",
            )
            if not self.union_on_mismatch:
                answered = answered[:1]
        keys, seen = [], set()
        for _, ks in answered:
            for k in ks:
                if k not in seen:
                    seen.add(k)
                    keys.append(k)
        if not keys and self._last_key_error is not None:
            # records existed but none parsed to a usable key: surface the
            # last taxonomy error, not a bare "no key" (getPublicKey:295-297)
            raise self._last_key_error
        return keys


class ArchiveResolver:
    """ZK Email archive fallback for rotated keys (dns-archive.ts:5)."""

    def __init__(self, url: str = ARCHIVE_URL, timeout: float = 10.0):
        self.url = url
        self.timeout = timeout

    def __call__(self, domain: str, selector: str):
        try:
            with urllib.request.urlopen(
                self.url.format(domain=domain), timeout=self.timeout
            ) as resp:
                entries = json.loads(resp.read())
        except Exception:
            return []
        keys, key_err = [], None
        for entry in entries:
            if entry.get("selector") != selector:
                continue
            try:
                parsed = parse_dkim_txt(entry.get("value", ""), strict=True)
            except Exception as exc:
                key_err = exc
                parsed = None
            if parsed:
                keys.append(parsed)
        if not keys and key_err is not None:
            raise key_err
        return keys


class ChainResolver:
    """Union of resolvers, preserving order (merged resolver, dkim/index.ts:124)."""

    def __init__(self, *resolvers):
        self.resolvers = resolvers

    def __call__(self, domain: str, selector: str):
        keys, seen = [], set()
        key_err = None
        for r in self.resolvers:
            try:
                found = r(domain, selector)
            except Exception as exc:  # taxonomy error: keep trying the chain
                key_err = exc
                continue
            for k in found:
                if k not in seen:
                    seen.add(k)
                    keys.append(k)
        if not keys and key_err is not None:
            raise key_err
        return keys
