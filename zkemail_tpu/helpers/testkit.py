"""Self-contained DKIM-signed test-email generation.

The reference ships real .eml fixtures whose DKIM keys live in public DNS;
this environment has no egress, so tests mint their own RSA-2048 keys, sign
emails per RFC 6376, and register the key in a StaticResolver — exercising
exactly the same verification path end-to-end.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import ed25519, padding, rsa

from .canon import canon_body, canon_header_relaxed
from .dkim import build_signature_base, parse_message, parse_tags
from .dns import StaticResolver
from .sha_utils import sha256


@dataclass
class LocalDKIMSigner:
    domain: str = "tpu.example.com"
    selector: str = "tpu2026"
    key_size: int = 2048

    def __post_init__(self):
        self._key = rsa.generate_private_key(public_exponent=65537, key_size=self.key_size)
        nums = self._key.public_key().public_numbers()
        self.public_key = (nums.n, nums.e)

    def resolver(self) -> StaticResolver:
        return StaticResolver({(self.domain, self.selector): [self.public_key]})

    def spki_base64(self) -> str:
        der = self._key.public_key().public_bytes(
            serialization.Encoding.DER, serialization.PublicFormat.SubjectPublicKeyInfo
        )
        return base64.b64encode(der).decode()

    def dns_txt_record(self) -> str:
        return f"v=DKIM1; k=rsa; p={self.spki_base64()}"

    def sign_email(
        self,
        frm: str | None = None,
        to: str = "alice@example.org",
        subject: str = "Hello from the TPU prover",
        body: bytes = b"This is a test body.\r\nIt proves DKIM on TPUs.\r\n",
        canon: str = "relaxed/relaxed",
        extra_headers: list | None = None,
        signed_headers: str = "from:to:subject:date:message-id",
    ) -> bytes:
        frm = frm or f"bob@{self.domain}"
        header_lines = [
            (b"From", frm.encode()),
            (b"To", to.encode()),
            (b"Subject", subject.encode()),
            (b"Date", b"Sun, 17 Aug 2026 12:00:00 +0000"),
            (b"Message-ID", b"<test-12345@" + self.domain.encode() + b">"),
        ] + [(k.encode(), v.encode()) for k, v in (extra_headers or [])]

        body_canon_algo = canon.split("/")[1]
        bh = base64.b64encode(sha256(canon_body(body, body_canon_algo))).decode()

        dkim_value = (
            f" v=1; a=rsa-sha256; c={canon}; d={self.domain}; s={self.selector};"
            f" h={signed_headers}; bh={bh}; b="
        )
        raw_no_sig = (
            b"".join(k + b": " + v + b"\r\n" for k, v in header_lines)
            + b"DKIM-Signature:" + dkim_value.encode() + b"\r\n"
            + b"\r\n" + body
        )
        parsed = parse_message(raw_no_sig)
        sig_header_raw = next(
            raw for (n, raw, v) in parsed.headers if n == "dkim-signature"
        )
        tags = parse_tags(sig_header_raw.split(b":", 1)[1])
        base = build_signature_base(parsed, sig_header_raw, tags)
        signature = self._key.sign(base, padding.PKCS1v15(), hashes.SHA256())
        b64sig = base64.b64encode(signature).decode()
        return (
            b"".join(k + b": " + v + b"\r\n" for k, v in header_lines)
            + b"DKIM-Signature:" + dkim_value.encode() + b64sig.encode() + b"\r\n"
            + b"\r\n" + body
        )


@dataclass
class LocalEd25519DKIMSigner:
    """RFC 8463 ed25519-sha256 signer: host-verification parity fixtures
    (the reference's mailauth verifies these, tools.ts:266-376; the circuit
    cannot prove them — results carry circuit_provable=False)."""

    domain: str = "tpu.example.com"
    selector: str = "tpu2026ed"

    def __post_init__(self):
        self._key = ed25519.Ed25519PrivateKey.generate()
        raw = self._key.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw
        )
        self.public_key = ("ed25519", raw)

    def resolver(self) -> StaticResolver:
        return StaticResolver({(self.domain, self.selector): [self.public_key]})

    def dns_txt_record(self) -> str:
        return (
            "v=DKIM1; k=ed25519; p="
            + base64.b64encode(self.public_key[1]).decode()
        )

    def sign_email(
        self,
        frm: str | None = None,
        to: str = "alice@example.org",
        subject: str = "Hello from the TPU prover",
        body: bytes = b"This is a test body.\r\nIt proves DKIM on TPUs.\r\n",
        canon: str = "relaxed/relaxed",
        signed_headers: str = "from:to:subject:date:message-id",
    ) -> bytes:
        frm = frm or f"bob@{self.domain}"
        header_lines = [
            (b"From", frm.encode()),
            (b"To", to.encode()),
            (b"Subject", subject.encode()),
            (b"Date", b"Sun, 17 Aug 2026 12:00:00 +0000"),
            (b"Message-ID", b"<test-ed-12345@" + self.domain.encode() + b">"),
        ]
        body_canon_algo = canon.split("/")[1]
        bh = base64.b64encode(sha256(canon_body(body, body_canon_algo))).decode()
        dkim_value = (
            f" v=1; a=ed25519-sha256; c={canon}; d={self.domain};"
            f" s={self.selector}; h={signed_headers}; bh={bh}; b="
        )
        raw_no_sig = (
            b"".join(k + b": " + v + b"\r\n" for k, v in header_lines)
            + b"DKIM-Signature:" + dkim_value.encode() + b"\r\n"
            + b"\r\n" + body
        )
        parsed = parse_message(raw_no_sig)
        sig_header_raw = next(
            raw for (n, raw, v) in parsed.headers if n == "dkim-signature"
        )
        tags = parse_tags(sig_header_raw.split(b":", 1)[1])
        base = build_signature_base(parsed, sig_header_raw, tags)
        # RFC 8463: PureEdDSA over the SHA-256 digest of the signature base
        signature = self._key.sign(sha256(base))
        b64sig = base64.b64encode(signature).decode()
        return (
            b"".join(k + b": " + v + b"\r\n" for k, v in header_lines)
            + b"DKIM-Signature:" + dkim_value.encode() + b64sig.encode() + b"\r\n"
            + b"\r\n" + body
        )
