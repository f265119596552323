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
        signer = _signer;
        dkimRegistry = new DKIMRegistry(address(this));
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
        require(bytes(domainName).length != 0, "invalid domain name");
        require(publicKeyHash != bytes32(0), "invalid public key hash");
        require(
            !isDKIMPublicKeyHashValid(domainName, publicKeyHash),
            "public key hash is already set"
        );
        string memory signedMsg = computeSignedMsg(
            SET_PREFIX, selector, domainName, publicKeyHash
        );
        require(
            _recoverEthSigned(signedMsg, signature) == signer,
            "invalid signature"
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
        require(bytes(domainName).length != 0, "invalid domain name");
        require(publicKeyHash != bytes32(0), "invalid public key hash");
        require(
            isDKIMPublicKeyHashValid(domainName, publicKeyHash),
            "public key hash is not set"
        );
        string memory signedMsg = computeSignedMsg(
            REVOKE_PREFIX, selector, domainName, publicKeyHash
        );
        require(
            _recoverEthSigned(signedMsg, signature) == signer,
            "invalid signature"
        );
        dkimRegistry.revokeDKIMPublicKeyHash(
            keccak256(abi.encodePacked(domainName)), publicKeyHash
        );
    }

    /// @notice The exact message format that must be signed
    function computeSignedMsg(
        string memory prefix,
        string memory selector,
        string memory domainName,
        bytes32 publicKeyHash
    ) public pure returns (string memory) {
        return string.concat(
            prefix,
            "selector=", selector,
            ";domain=", domainName,
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
        bytes16 symbols = "0123456789abcdef";
        bytes memory buf = new bytes(66);
        buf[0] = "0";
        buf[1] = "x";
        for (uint256 i = 0; i < 32; i++) {
            buf[2 + 2 * i] = symbols[uint8(value[i]) >> 4];
            buf[3 + 2 * i] = symbols[uint8(value[i]) & 0x0F];
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
