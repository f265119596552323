// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

import {IERC7969} from "./interfaces/IERC7969.sol";

/// @title Ownable DKIM public-key-hash registry.
/// Semantic parity with the reference registry
/// (packages/contracts/DKIMRegistry.sol:15): an owner-gated store mapping
/// keccak(domain) x pubkeyHash -> validity, consumed on-chain together with
/// the Groth16 verifier's pubkeyHash public signal.
contract DKIMRegistry is IERC7969 {
    address public owner;

    // domainHash => keyHash => valid
    mapping(bytes32 => mapping(bytes32 => bool)) private dkimKeyHashes;

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
        return dkimKeyHashes[domainHash][keyHash];
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
        dkimKeyHashes[domainHash][keyHash] = true;
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

    function revokeDKIMPublicKeyHash(bytes32 domainHash, bytes32 keyHash)
        public
        onlyOwner
    {
        require(isKeyHashValid(domainHash, keyHash), "DKIMRegistry: unknown key hash");
        dkimKeyHashes[domainHash][keyHash] = false;
        emit KeyHashRevoked(domainHash, keyHash);
    }

    function transferOwnership(address newOwner) public onlyOwner {
        require(newOwner != address(0), "DKIMRegistry: zero owner");
        owner = newOwner;
    }
}
