"""Python mirrors of the Solidity contract logic, for EVM-free testing.

Parity: each function matches the corresponding library in
zkemail_tpu/contracts/*.sol (and the reference
packages/contracts/utils/{CircomUtils,NoirUtils,StringUtils}.sol,
UserOverrideableDKIMRegistry.sol).  The packing mirrors are cross-checked
against helpers.binary_format in tests — the circuit <-> contract layout
agreement the reference relies on (CircomUtils packing == circuit PackBytes).
"""

from __future__ import annotations

from dataclasses import dataclass, field

BYTES_PER_FIELD = 31


# --------------------------------------------------------------- CircomUtils
def circom_pack_fields(data: bytes) -> list[int]:
    n = (len(data) + BYTES_PER_FIELD - 1) // BYTES_PER_FIELD
    out = []
    for k in range(n):
        acc = 0
        for j in range(BYTES_PER_FIELD):
            i = k * BYTES_PER_FIELD + j
            if i >= len(data):
                break
            acc |= data[i] << (8 * j)
        out.append(acc)
    return out


def circom_unpack_fields(fields: list[int], byte_length: int) -> bytes:
    out = bytearray(byte_length)
    for i in range(byte_length):
        k, j = divmod(i, BYTES_PER_FIELD)
        out[i] = (fields[k] >> (8 * j)) & 0xFF
    return bytes(out)


# ----------------------------------------------------------------- NoirUtils
def noir_pack_bounded_vec_u8(data: bytes, max_length: int) -> list[int]:
    assert len(data) <= max_length
    out = [0] * (max_length + 1)
    for i, b in enumerate(data):
        out[i] = b
    out[max_length] = len(data)
    return out


def noir_pack_fields(data: bytes) -> list[int]:
    return list(data)


def noir_unpack_fields(fields: list[int]) -> bytes:
    assert all(0 <= f < 256 for f in fields)
    return bytes(fields)


# --------------------------------------------------------------- StringUtils
def convert_packed_bytes_to_string(packed: list[int], pack_size: int = BYTES_PER_FIELD) -> str:
    seen_null = False
    out = bytearray()
    for p in packed:
        for j in range(pack_size):
            b = (p >> (8 * j)) & 0xFF
            if b == 0:
                seen_null = True
            else:
                if seen_null:
                    raise ValueError("non-zero byte after null")
                out.append(b)
    return out.decode("utf-8")


def get_domain_from_email(email: str) -> str:
    if "@" not in email:
        raise ValueError("no @ in email")
    return email.rsplit("@", 1)[1]


# ----------------------------------------- UserOverrideableDKIMRegistry model
@dataclass
class UserOverrideableRegistryModel:
    """Executable model of the override/delay/reactivate validity logic."""

    main_authorizer: str
    set_timestamp_delay: int
    now: int = 0
    approved: dict = field(default_factory=dict)  # (dom, key, who) -> True
    revoked: dict = field(default_factory=dict)
    enabled_time: dict = field(default_factory=dict)  # (dom, key) -> ts
    reactivations: dict = field(default_factory=dict)

    def set_key(self, dom, key, who):
        assert not self.approved.get((dom, key, who)), "already set"
        self.approved[(dom, key, who)] = True
        if who == self.main_authorizer:
            self.enabled_time[(dom, key)] = self.now + self.set_timestamp_delay

    def revoke(self, dom, key, who):
        assert not self.revoked.get((dom, key, who)), "already revoked"
        self.revoked[(dom, key, who)] = True

    def reactivate(self, dom, key, user):
        assert self.revoked.get((dom, key, self.main_authorizer)), "not revoked by main"
        self.reactivations[(dom, key, user)] = True

    def is_valid(self, dom, key, user) -> bool:
        et = self.enabled_time.get((dom, key))
        main_ok = (
            self.approved.get((dom, key, self.main_authorizer), False)
            and et is not None
            and self.now >= et
        )
        user_ok = self.approved.get((dom, key, user), False)
        if self.revoked.get((dom, key, user)):
            return False
        if self.revoked.get((dom, key, self.main_authorizer)) and not self.reactivations.get(
            (dom, key, user)
        ):
            return False
        return main_ok or user_ok
