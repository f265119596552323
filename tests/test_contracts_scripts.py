"""Contract packing parity + registry tooling tests (EVM-free)."""

from pathlib import Path

import pytest

from zkemail_tpu.contracts.reference_impl import (
    UserOverrideableRegistryModel,
    circom_pack_bool,
    circom_pack_fields,
    circom_pack_fields_padded,
    circom_unpack_bool,
    circom_unpack_fields,
    circom_unpack_fields_padded,
    convert_packed_bytes_to_string,
    get_domain_from_email,
    noir_pack_bounded_vec_u8,
    noir_pack_fields,
    noir_unpack_bounded_vec_u8,
    noir_unpack_fields,
)
from zkemail_tpu.helpers.binary_format import pack_bytes_to_fields
from zkemail_tpu.helpers.testkit import LocalDKIMSigner
from zkemail_tpu.scripts.update_dkim_registry import (
    COMMON_SELECTORS,
    crawl_domains,
    pubkey_hash,
    registry_calldata,
)
from zkemail_tpu.core.poseidon import poseidon_large
from zkemail_tpu.helpers.dns import StaticResolver
from zkemail_tpu.utils.keccak import keccak_256


def test_circom_packing_matches_circuit_layout():
    """Contract CircomUtils packing == helpers PackBytes == circuit layout."""
    data = b"reveal-me@zkemail.example"
    assert circom_pack_fields(data) == pack_bytes_to_fields(data)
    assert circom_unpack_fields(circom_pack_fields(data), len(data)) == data
    assert convert_packed_bytes_to_string(circom_pack_fields(data)) == data.decode()


def test_noir_packing_roundtrip():
    """Reference NoirUtils ABI: 31-byte LE fields + BoundedVec<u8> encoding
    (packages/contracts/utils/NoirUtils.sol:10-51)."""
    data = bytes(range(1, 60))
    # packFieldsArray: ceil(59/31)=2 fields, LE within each
    fields = noir_pack_fields(data, 2)
    assert len(fields) == 2
    assert fields[0] == int.from_bytes(data[:31], "little")
    assert noir_unpack_fields(fields) == data  # trailing-zero trim
    with pytest.raises(ValueError, match="InvalidLength"):
        noir_pack_fields(data, 1)
    # BoundedVec: numFields INCLUDES the length slot
    bv = noir_pack_bounded_vec_u8(data, 65)
    assert len(bv) == 65 and bv[64] == len(data) and bv[: len(data)] == list(data)
    assert noir_unpack_bounded_vec_u8(bv) == data
    with pytest.raises(ValueError, match="InvalidLength"):
        noir_pack_bounded_vec_u8(data, len(data))


def test_circom_padded_and_bool_packing():
    """Reference CircomUtils ABI: paddedSize forms + packBool/unpackBool
    (packages/contracts/utils/CircomUtils.sol:41,78,94,129)."""
    data = b"user@zkemail.example"
    padded = 62  # 2 fields
    fields = circom_pack_fields_padded(data, padded)
    assert len(fields) == 2
    # zero-padding beyond the data, identical prefix to the unpadded form
    assert fields[0] == circom_pack_fields(data + bytes(62 - len(data)))[0]
    assert circom_unpack_fields_padded(fields, padded) == data  # trim zeros
    with pytest.raises(ValueError, match="InvalidDataLength"):
        circom_pack_fields_padded(bytes(63), padded)
    with pytest.raises(IndexError):  # undersized fields = solidity OOB panic
        circom_unpack_fields_padded(fields[:1], padded)
    # internal zeros survive the trim; only the trailing run is dropped
    z = b"a\x00b\x00"
    assert circom_unpack_fields_padded(circom_pack_fields_padded(z, 31), 31) == b"a\x00b"
    assert circom_pack_bool(True) == [1] and circom_pack_bool(False) == [0]
    assert circom_unpack_bool([1]) is True and circom_unpack_bool([0]) is False


def test_get_domain():
    assert get_domain_from_email("alice@sub.example.com") == "sub.example.com"


def test_overrideable_registry_model():
    """Smoke of the threshold semantics; the full reference matrix lives in
    tests/test_contracts_registry_flows.py."""
    m = UserOverrideableRegistryModel("0xmain", set_timestamp_delay=100, now=0)
    dom, key = "d.example", 7
    # main approval alone activates only after the delay
    m.set_key(dom, key, "0xmain", sender="0xmain")
    assert not m.is_valid(dom, key, "0xuser1")
    m.now = 100
    assert m.is_valid(dom, key, "0xuser1")
    # user can self-approve another key immediately
    m.set_key(dom, 8, "0xuser2", sender="0xuser2")
    assert m.is_valid(dom, 8, "0xuser2")
    assert not m.is_valid(dom, 8, "0xuser1")
    # main revocation blocks everyone until per-user reactivation (which
    # requires that user's own approval, set threshold >= 2)
    m.revoke(dom, key, "0xmain", sender="0xmain")
    assert not m.is_valid(dom, key, "0xuser1")
    m.set_key(dom, key, "0xuser1", sender="0xuser1")
    m.reactivate(dom, key, "0xuser1", sender="0xuser1")
    assert m.is_valid(dom, key, "0xuser1")
    assert not m.is_valid(dom, key, "0xuser3")
    # user self-revocation is final for that user
    m.revoke(dom, 8, "0xuser2", sender="0xuser2")
    assert not m.is_valid(dom, 8, "0xuser2")


def test_registry_crawl_and_hash():
    signer = LocalDKIMSigner(domain="corp.example", selector="selector1")
    resolver = signer.resolver()
    crawled = crawl_domains(["corp.example", "nokeys.example"], resolver=resolver)
    assert "corp.example" in crawled and "nokeys.example" not in crawled
    entry = crawled["corp.example"][0]
    assert entry["selector"] == "selector1"
    n = int(entry["modulus"], 16)
    assert int(entry["pubkeyHash"]) == poseidon_large(n, 121, 9)
    calls = registry_calldata(crawled)
    assert calls[0]["method"] == "setDKIMPublicKeyHashes"
    assert calls[0]["domainHash"] == "0x" + keccak_256(b"corp.example").hex()
    assert len(COMMON_SELECTORS) >= 40


def test_solidity_sources_present():
    base = Path(__file__).resolve().parent.parent / "zkemail_tpu" / "contracts"
    for name in [
        "DKIMRegistry.sol",
        "ECDSAOwnedDKIMRegistry.sol",
        "UserOverrideableDKIMRegistry.sol",
        "interfaces/IERC7969.sol",
        "utils/CircomUtils.sol",
        "utils/NoirUtils.sol",
        "utils/StringUtils.sol",
    ]:
        assert (base / name).exists(), name
