// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

/// @title ERC-7969 DKIM public key hash registry interface.
/// ABI parity with the reference interface (packages/contracts/interfaces/
/// IERC7969.sol:13 — interface name IDKIMRegistry, ERC-165 id 0xdee3d600):
/// same event signatures (non-indexed args; KeyHashRevoked carries one
/// bytes32) so log consumers written against the reference decode ours.
interface IDKIMRegistry {
    /// @notice Emitted when a key hash is registered for a domain hash
    event KeyHashRegistered(bytes32 domainHash, bytes32 keyHash);

    /// @notice Emitted when a key hash is revoked
    event KeyHashRevoked(bytes32 domainHash);

    /// @notice Checks whether a DKIM key hash is currently valid for a domain
    /// @param domainHash keccak256 of the lowercase domain name
    /// @param keyHash hash of the DKIM RSA public key (circuit pubkeyHash)
    function isKeyHashValid(bytes32 domainHash, bytes32 keyHash)
        external
        view
        returns (bool);
}
