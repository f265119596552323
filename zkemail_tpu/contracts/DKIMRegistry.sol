// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

import {IDKIMRegistry} from "./interfaces/IERC7969.sol";

/// @title Ownable DKIM public-key-hash registry.
/// Semantic parity with the reference registry
/// (packages/contracts/DKIMRegistry.sol:15): an owner-gated store mapping
/// keccak(domain) x pubkeyHash -> validity, with a GLOBAL permanent
/// revocation set per key hash (revokedDKIMPublicKeyHashes — revoking a
/// compromised key kills it for every domain, and a revoked key can never
/// be re-set: "cannot set revoked pubkey"). Consumed on-chain together with
/// the Groth16 verifier's pubkeyHash public signal. Ownable is hand-rolled
/// (no OpenZeppelin in this repo) but the external ABI matches.
contract DKIMRegistry is IDKIMRegistry {
    address public owner;

    // Mapping from domain name hash to DKIM public key hash
    mapping(bytes32 => mapping(bytes32 => bool)) public dkimPublicKeyHashes;

    // DKIM public keys that are revoked (eg: in case of private key compromise)
    mapping(bytes32 => bool) public revokedDKIMPublicKeyHashes;

    modifier onlyOwner() {
        require(msg.sender == owner, "DKIMRegistry: caller is not the owner");
        _;
    }

    constructor(address _owner) {
        owner = _owner == address(0) ? msg.sender : _owner;
    }

    function isKeyHashValid(bytes32 domainHash, bytes32 keyHash)
        public
        view
        returns (bool)
    {
        return
            dkimPublicKeyHashes[domainHash][keyHash] &&
            !revokedDKIMPublicKeyHashes[keyHash];
    }

    /// @notice Convenience overload over the plain domain string
    function isDKIMPublicKeyHashValid(string memory domainName, bytes32 keyHash)
        public
        view
        returns (bool)
    {
        return isKeyHashValid(keccak256(abi.encodePacked(domainName)), keyHash);
    }

    function setDKIMPublicKeyHash(bytes32 domainHash, bytes32 keyHash)
        public
        onlyOwner
    {
        require(
            !revokedDKIMPublicKeyHashes[keyHash],
            "cannot set revoked pubkey"
        );
        dkimPublicKeyHashes[domainHash][keyHash] = true;
        emit KeyHashRegistered(domainHash, keyHash);
    }

    function setDKIMPublicKeyHashes(
        bytes32 domainHash,
        bytes32[] memory keyHashes
    ) public onlyOwner {
        for (uint256 i = 0; i < keyHashes.length; i++) {
            setDKIMPublicKeyHash(domainHash, keyHashes[i]);
        }
    }

    function revokeDKIMPublicKeyHash(bytes32 keyHash) public onlyOwner {
        revokedDKIMPublicKeyHashes[keyHash] = true;
        emit KeyHashRevoked(keyHash);
    }

    function transferOwnership(address newOwner) public onlyOwner {
        require(newOwner != address(0), "DKIMRegistry: zero owner");
        owner = newOwner;
    }
}
