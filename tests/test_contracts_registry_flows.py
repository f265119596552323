"""Registry contract flow matrices, ported from the reference foundry suites.

Executes the Python mirrors in contracts/reference_impl.py (EVM-free; real
ECDSA via utils/secp256k1) against the reference's test matrix:
packages/contracts/test/UserOverrideableDKIMRegistry.t.sol (49 tests:
delay / override / reactivate / ECDSA / EIP-1271 / reverts) and
test/ECDSAOwnedDKIMRegistry/{setDKIMPublicKeyHash,revokeDKIMPublicKeyHash,
computeSignedMsg}.t.sol.
"""

import pytest

from zkemail_tpu.contracts.reference_impl import (
    ECDSAOwnedRegistryModel,
    ERC1271Wallet,
    RevertError,
    UserOverrideableRegistryModel,
    compute_signed_msg,
    eth_signed_digest,
)
from zkemail_tpu.utils import secp256k1 as EC

DOMAIN = "example.com"
KEY = 1  # bytes32(uint256(1)), as in the reference suite
DELAY = 1000

MAIN_PRIV = 1
USER1_PRIV = 2
USER2_PRIV = 3
MAIN = EC.privkey_to_address(MAIN_PRIV)
USER1 = EC.privkey_to_address(USER1_PRIV)
USER2 = EC.privkey_to_address(USER2_PRIV)


def sign_msg(priv: int, prefix: str, domain: str = DOMAIN, key: int = KEY) -> bytes:
    digest = eth_signed_digest(compute_signed_msg(prefix, domain, key).encode())
    return EC.sig_bytes(*EC.sign(priv, digest))


@pytest.fixture
def reg():
    return UserOverrideableRegistryModel(MAIN, DELAY, owner="0xdeployer", now=0)


# ------------------------------------------------------------------- set

def test_set_by_user1(reg):
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    assert reg.is_valid(DOMAIN, KEY, USER1)  # setThreshold = 2


def test_set_by_main_before_enabled(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    # main alone counts 1 before the delay -> user confirmation required
    assert not reg.is_valid(DOMAIN, KEY, USER1)
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    assert reg.is_valid(DOMAIN, KEY, USER1)  # setThreshold = 3


def test_set_by_main_after_enabled(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    reg.now = DELAY
    assert reg.is_valid(DOMAIN, KEY, USER1)  # setThreshold = 2


def test_set_by_main_ecdsa_relayer(reg):
    # relayer (user1) submits the main authorizer's ECDSA-signed SET
    sig = sign_msg(MAIN_PRIV, reg.SET_PREFIX)
    reg.set_key(DOMAIN, KEY, MAIN, sender=USER1, signature=sig)
    assert not reg.is_valid(DOMAIN, KEY, USER1)
    reg.now = DELAY
    assert reg.is_valid(DOMAIN, KEY, USER1)


def test_set_by_main_contract_eip1271(reg):
    wallet_addr = "0xmainwallet"
    reg.contracts[wallet_addr] = ERC1271Wallet(MAIN_PRIV)
    reg.main_authorizer = wallet_addr
    sig = sign_msg(MAIN_PRIV, reg.SET_PREFIX)
    reg.set_key(DOMAIN, KEY, wallet_addr, sender=USER1, signature=sig)
    reg.now = DELAY
    assert reg.is_valid(DOMAIN, KEY, USER1)


def test_set_invalid_ecdsa_reverts(reg):
    sig = sign_msg(USER2_PRIV, reg.SET_PREFIX)  # wrong signer
    with pytest.raises(RevertError, match="invalid ecdsa signature"):
        reg.set_key(DOMAIN, KEY, MAIN, sender=USER1, signature=sig)


def test_set_invalid_eip1271_reverts(reg):
    wallet_addr = "0xmainwallet"
    reg.contracts[wallet_addr] = ERC1271Wallet(MAIN_PRIV)
    sig = sign_msg(USER2_PRIV, reg.SET_PREFIX)
    with pytest.raises(RevertError, match="invalid eip1271 signature"):
        reg.set_key(DOMAIN, KEY, wallet_addr, sender=USER1, signature=sig)


def test_set_zero_args_revert(reg):
    with pytest.raises(RevertError, match="domain name cannot be zero"):
        reg.set_key("", KEY, USER1, sender=USER1)
    with pytest.raises(RevertError, match="public key hash cannot be zero"):
        reg.set_key(DOMAIN, 0, USER1, sender=USER1)


def test_set_twice_reverts(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    with pytest.raises(RevertError, match="already set"):
        reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)


def test_set_after_own_revoke_reverts(reg):
    # a revocation (no prior set needed) permanently blocks set for that
    # authorizer (reference :155-158: revoked check inside setDKIMPublicKeyHash)
    reg.revoke(DOMAIN, KEY, USER1, sender=USER1)
    with pytest.raises(RevertError, match="already revoked"):
        reg.set_key(DOMAIN, KEY, USER1, sender=USER1)


# ------------------------------------------------------------------- revoke

def test_revoke_by_user1_blocks_only_user1(reg):
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    reg.set_key(DOMAIN, KEY, USER2, sender=USER2)
    reg.revoke(DOMAIN, KEY, USER2, sender=USER2)
    # user2's revocation is scoped to user2 (revokeThreshold=2 for user2 only)
    assert reg.is_valid(DOMAIN, KEY, USER1)
    assert not reg.is_valid(DOMAIN, KEY, USER2)


def test_revoke_by_main_blocks_everyone(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    reg.now = DELAY
    assert reg.is_valid(DOMAIN, KEY, USER1)
    reg.revoke(DOMAIN, KEY, MAIN, sender=MAIN)
    assert not reg.is_valid(DOMAIN, KEY, USER1)
    assert not reg.is_valid(DOMAIN, KEY, USER2)


def test_revoke_by_main_ecdsa_relayer(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    reg.now = DELAY
    sig = sign_msg(MAIN_PRIV, reg.REVOKE_PREFIX)
    reg.revoke(DOMAIN, KEY, MAIN, sender=USER1, signature=sig)
    assert not reg.is_valid(DOMAIN, KEY, USER1)


def test_revoke_twice_reverts(reg):
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    reg.revoke(DOMAIN, KEY, USER1, sender=USER1)
    with pytest.raises(RevertError, match="already revoked"):
        reg.revoke(DOMAIN, KEY, USER1, sender=USER1)


# --------------------------------------------------------------- reactivate

def test_reactivate_after_main_revoke(reg):
    """A malicious main-authorizer revoke is undone per-user by reactivation
    (reference :435-500) — requires the user's own approval (threshold >= 2)."""
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    reg.now = DELAY
    reg.revoke(DOMAIN, KEY, MAIN, sender=MAIN)
    assert not reg.is_valid(DOMAIN, KEY, USER1)
    reg.reactivate(DOMAIN, KEY, USER1, sender=USER1)
    assert reg.is_valid(DOMAIN, KEY, USER1)
    assert not reg.is_valid(DOMAIN, KEY, USER2)  # scoped to user1


def test_reactivate_before_enabled_requires_user_set(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)  # before delay: threshold 1
    reg.revoke(DOMAIN, KEY, MAIN, sender=MAIN)
    with pytest.raises(RevertError, match="set threshold"):
        reg.reactivate(DOMAIN, KEY, USER1, sender=USER1)


def test_reactivate_by_main_reverts(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    reg.revoke(DOMAIN, KEY, MAIN, sender=MAIN)
    with pytest.raises(RevertError, match="mainAuthorizer cannot reactivate"):
        reg.reactivate(DOMAIN, KEY, MAIN, sender=MAIN)


def test_reactivate_without_main_revoke_reverts(reg):
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    with pytest.raises(RevertError, match="revoke threshold must be one"):
        reg.reactivate(DOMAIN, KEY, USER1, sender=USER1)


def test_reactivate_after_own_revoke_reverts(reg):
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    reg.revoke(DOMAIN, KEY, MAIN, sender=MAIN)
    reg.revoke(DOMAIN, KEY, USER1, sender=USER1)
    with pytest.raises(RevertError, match="revoke threshold must be one"):
        reg.reactivate(DOMAIN, KEY, USER1, sender=USER1)


def test_reactivate_ecdsa_relayer(reg):
    reg.set_key(DOMAIN, KEY, MAIN, sender=MAIN)
    reg.set_key(DOMAIN, KEY, USER1, sender=USER1)
    reg.now = DELAY
    reg.revoke(DOMAIN, KEY, MAIN, sender=MAIN)
    sig = sign_msg(USER1_PRIV, reg.REACTIVATE_PREFIX)
    reg.reactivate(DOMAIN, KEY, USER1, sender=USER2, signature=sig)
    assert reg.is_valid(DOMAIN, KEY, USER1)


# ------------------------------------------------------------------- admin

def test_change_main_authorizer_only_owner(reg):
    with pytest.raises(RevertError, match="not the owner"):
        reg.change_main_authorizer(USER2, sender=USER1)
    reg.change_main_authorizer(USER2, sender="0xdeployer")
    assert reg.main_authorizer == USER2
    with pytest.raises(RevertError, match="cannot be the same"):
        reg.change_main_authorizer(USER2, sender="0xdeployer")


def test_is_valid_main_as_authorizer_reverts(reg):
    with pytest.raises(RevertError, match="authorizer cannot be mainAuthorizer"):
        reg.is_valid(DOMAIN, KEY, MAIN)


# ------------------------------------------------------------ signed message

def test_compute_signed_msgs_exact():
    """Byte-exact parity with the reference expectations (t.sol:955-1000)."""
    assert compute_signed_msg("SET:", DOMAIN, KEY) == (
        "SET:domain=example.com;public_key_hash=0x01;"
    )
    assert compute_signed_msg("REVOKE:", DOMAIN, KEY) == (
        "REVOKE:domain=example.com;public_key_hash=0x01;"
    )
    assert compute_signed_msg("REACTIVATE:", DOMAIN, KEY) == (
        "REACTIVATE:domain=example.com;public_key_hash=0x01;"
    )


# ------------------------------------------------------- ECDSAOwned registry

def test_ecdsa_owned_set_and_revoke():
    m = ECDSAOwnedRegistryModel(signer=MAIN)
    assert m.compute_signed_msg("SET:", DOMAIN, KEY) == (
        "SET:domain=example.com;public_key_hash=0x01;"
    )
    sig = sign_msg(MAIN_PRIV, "SET:")
    m.set_key("20230601", DOMAIN, KEY, sig)
    assert m.is_valid(DOMAIN, KEY)
    with pytest.raises(RevertError, match="already set"):
        m.set_key("20230601", DOMAIN, KEY, sig)
    rsig = sign_msg(MAIN_PRIV, "REVOKE:")
    m.revoke_key("20230601", DOMAIN, KEY, rsig)
    assert not m.is_valid(DOMAIN, KEY)
    with pytest.raises(RevertError, match="is not set"):
        m.revoke_key("20230601", DOMAIN, KEY, rsig)


def test_ecdsa_owned_rejects_wrong_signer():
    m = ECDSAOwnedRegistryModel(signer=MAIN)
    sig = sign_msg(USER1_PRIV, "SET:")
    with pytest.raises(RevertError, match="Invalid signature"):
        m.set_key("sel", DOMAIN, KEY, sig)
