// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

import {DKIMRegistry} from "./DKIMRegistry.sol";

/// @title DKIM registry whose updates are gated by ECDSA signatures from a
/// designated signer (instead of direct ownership).
/// Semantic parity with packages/contracts/ECDSAOwnedDKIMRegistry.sol:13 —
/// set/revoke require a "SET:"/"REVOKE:" message signed by `signer`
/// (computeSignedMsg:99-106, recover at :58-61).
contract ECDSAOwnedDKIMRegistry {
    DKIMRegistry public dkimRegistry;
    address public signer;

    string public constant SET_PREFIX = "SET:";
    string public constant REVOKE_PREFIX = "REVOKE:";

    constructor(address _signer) {
        require(_signer != address(0), "invalid signer");
        // this contract owns the registry; the signer gates set/revoke
        dkimRegistry = new DKIMRegistry(address(this));
        signer = _signer;
    }

    function isKeyHashValid(bytes32 domainHash, bytes32 keyHash)
        public
        view
        returns (bool)
    {
        return dkimRegistry.isKeyHashValid(domainHash, keyHash);
    }

    function isDKIMPublicKeyHashValid(
        string memory domainName,
        bytes32 publicKeyHash
    ) public view returns (bool) {
        return dkimRegistry.isDKIMPublicKeyHashValid(domainName, publicKeyHash);
    }

    function setDKIMPublicKeyHash(
        string memory selector,
        string memory domainName,
        bytes32 publicKeyHash,
        bytes memory signature
    ) public {
        require(bytes(selector).length != 0, "Invalid selector");
        require(bytes(domainName).length != 0, "Invalid domain name");
        require(publicKeyHash != bytes32(0), "Invalid public key hash");
        require(
            !isDKIMPublicKeyHashValid(domainName, publicKeyHash),
            "publicKeyHash is already set"
        );
        require(
            !dkimRegistry.revokedDKIMPublicKeyHashes(publicKeyHash),
            "publicKeyHash is revoked"
        );
        string memory signedMsg = computeSignedMsg(SET_PREFIX, domainName, publicKeyHash);
        require(
            _recoverEthSigned(signedMsg, signature) == signer,
            "Invalid signature"
        );
        dkimRegistry.setDKIMPublicKeyHash(
            keccak256(abi.encodePacked(domainName)), publicKeyHash
        );
    }

    function revokeDKIMPublicKeyHash(
        string memory selector,
        string memory domainName,
        bytes32 publicKeyHash,
        bytes memory signature
    ) public {
        require(bytes(selector).length != 0, "Invalid selector");
        require(bytes(domainName).length != 0, "Invalid domain name");
        require(publicKeyHash != bytes32(0), "Invalid public key hash");
        require(
            isDKIMPublicKeyHashValid(domainName, publicKeyHash),
            "publicKeyHash is not set"
        );
        require(
            !dkimRegistry.revokedDKIMPublicKeyHashes(publicKeyHash),
            "publicKeyHash is already revoked"
        );
        string memory signedMsg = computeSignedMsg(REVOKE_PREFIX, domainName, publicKeyHash);
        require(
            _recoverEthSigned(signedMsg, signature) == signer,
            "Invalid signature"
        );
        dkimRegistry.revokeDKIMPublicKeyHash(publicKeyHash);
    }

    /// @notice The exact message format that must be signed — byte-identical
    /// to the reference (ECDSAOwnedDKIMRegistry.sol:99-106: no selector in the
    /// message, minimal-length lowercase 0x-hex of the key hash), so
    /// reference-generated signatures stay valid here.
    function computeSignedMsg(
        string memory prefix,
        string memory domainName,
        bytes32 publicKeyHash
    ) public pure returns (string memory) {
        return string.concat(
            prefix,
            "domain=", domainName,
            ";public_key_hash=", _toHexString(publicKeyHash),
            ";"
        );
    }

    function _recoverEthSigned(string memory message, bytes memory signature)
        internal
        pure
        returns (address)
    {
        bytes32 digest = keccak256(
            abi.encodePacked(
                "\x19Ethereum Signed Message:\n",
                _uintToString(bytes(message).length),
                message
            )
        );
        require(signature.length == 65, "invalid signature length");
        bytes32 r;
        bytes32 s;
        uint8 v;
        assembly {
            r := mload(add(signature, 0x20))
            s := mload(add(signature, 0x40))
            v := byte(0, mload(add(signature, 0x60)))
        }
        if (v < 27) v += 27;
        return ecrecover(digest, v, r, s);
    }

    function _toHexString(bytes32 value) internal pure returns (string memory) {
        // minimal-length lowercase hex (OZ Strings.toHexString(uint256))
        bytes16 symbols = "0123456789abcdef";
        uint256 v = uint256(value);
        uint256 length = 0;
        for (uint256 tmp = v; tmp != 0; tmp >>= 8) length++;
        if (length == 0) length = 1;
        bytes memory buf = new bytes(2 * length + 2);
        buf[0] = "0";
        buf[1] = "x";
        for (uint256 i = 2 * length + 1; i > 1; i--) {
            buf[i] = symbols[v & 0xf];
            v >>= 4;
        }
        return string(buf);
    }

    function _uintToString(uint256 v) internal pure returns (string memory) {
        if (v == 0) return "0";
        uint256 tmp = v;
        uint256 digits;
        while (tmp != 0) {
            digits++;
            tmp /= 10;
        }
        bytes memory buf = new bytes(digits);
        while (v != 0) {
            digits -= 1;
            buf[digits] = bytes1(uint8(48 + (v % 10)));
            v /= 10;
        }
        return string(buf);
    }
}
