// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

import {IERC7969} from "./interfaces/IERC7969.sol";

/// @title DKIM registry with a main authorizer plus per-user overrides.
/// Semantic parity with packages/contracts/UserOverrideableDKIMRegistry.sol:19 —
/// three-level keying domain x key x authorizer (:43-56), main-authorizer
/// approvals take effect only after `setTimestampDelay` (:40, threshold logic
/// :396-444), users can approve keys for themselves immediately, and a
/// malicious main-authorizer revocation can be undone per-user via
/// reactivation (:297).  (The reference is UUPS-upgradeable; proxy plumbing
/// is deployment tooling and intentionally out of scope here.)
contract UserOverrideableDKIMRegistry is IERC7969 {
    address public mainAuthorizer;
    uint256 public setTimestampDelay;

    // domainHash => keyHash => authorizer => approved
    mapping(bytes32 => mapping(bytes32 => mapping(address => bool))) public dkimApproved;
    // domainHash => keyHash => authorizer => revoked
    mapping(bytes32 => mapping(bytes32 => mapping(address => bool))) public dkimRevoked;
    // domainHash => keyHash => time when the main authorizer's approval activates
    mapping(bytes32 => mapping(bytes32 => uint256)) public enabledTimeOfDKIMPublicKeyHash;
    // user reactivations overriding a main-authorizer revocation
    mapping(bytes32 => mapping(bytes32 => mapping(address => bool))) public reactivated;

    event DKIMPublicKeyHashRegistered(
        bytes32 indexed domainHash, bytes32 indexed keyHash, address indexed authorizer
    );
    event DKIMPublicKeyHashRevoked(bytes32 indexed keyHash, address indexed authorizer);
    event DKIMPublicKeyHashReactivated(bytes32 indexed keyHash, address indexed user);

    constructor(address _mainAuthorizer, uint256 _setTimestampDelay) {
        mainAuthorizer = _mainAuthorizer;
        setTimestampDelay = _setTimestampDelay;
    }

    /// @notice ERC-7969 view: valid if approved (by main authorizer past the
    /// delay, or by the caller-as-user) and not effectively revoked.
    function isKeyHashValid(bytes32 domainHash, bytes32 keyHash)
        public
        view
        returns (bool)
    {
        return isDKIMPublicKeyHashValid(domainHash, keyHash, msg.sender);
    }

    function isDKIMPublicKeyHashValid(
        bytes32 domainHash,
        bytes32 keyHash,
        address user
    ) public view returns (bool) {
        bool mainApproved = dkimApproved[domainHash][keyHash][mainAuthorizer]
            && block.timestamp >= enabledTimeOfDKIMPublicKeyHash[domainHash][keyHash]
            && enabledTimeOfDKIMPublicKeyHash[domainHash][keyHash] != 0;
        bool userApproved = dkimApproved[domainHash][keyHash][user];
        bool mainRevoked = dkimRevoked[domainHash][keyHash][mainAuthorizer];
        bool userRevoked = dkimRevoked[domainHash][keyHash][user];
        bool userReactivated = reactivated[domainHash][keyHash][user];

        if (userRevoked) return false;
        if (mainRevoked && !userReactivated) return false;
        return mainApproved || userApproved;
    }

    function setDKIMPublicKeyHash(
        bytes32 domainHash,
        bytes32 keyHash,
        address authorizer
    ) public {
        require(authorizer == msg.sender, "not the authorizer");
        require(!dkimApproved[domainHash][keyHash][authorizer], "already set");
        dkimApproved[domainHash][keyHash][authorizer] = true;
        if (authorizer == mainAuthorizer) {
            enabledTimeOfDKIMPublicKeyHash[domainHash][keyHash] =
                block.timestamp + setTimestampDelay;
        }
        emit DKIMPublicKeyHashRegistered(domainHash, keyHash, authorizer);
        emit KeyHashRegistered(domainHash, keyHash);
    }

    function revokeDKIMPublicKeyHash(
        bytes32 domainHash,
        bytes32 keyHash,
        address authorizer
    ) public {
        require(authorizer == msg.sender, "not the authorizer");
        require(!dkimRevoked[domainHash][keyHash][authorizer], "already revoked");
        dkimRevoked[domainHash][keyHash][authorizer] = true;
        emit DKIMPublicKeyHashRevoked(keyHash, authorizer);
        emit KeyHashRevoked(domainHash, keyHash);
    }

    /// @notice Undo a main-authorizer revocation for the calling user only
    function reactivateDKIMPublicKeyHash(bytes32 domainHash, bytes32 keyHash)
        public
    {
        require(
            dkimRevoked[domainHash][keyHash][mainAuthorizer],
            "main authorizer has not revoked"
        );
        require(!reactivated[domainHash][keyHash][msg.sender], "already reactivated");
        reactivated[domainHash][keyHash][msg.sender] = true;
        emit DKIMPublicKeyHashReactivated(keyHash, msg.sender);
    }
}
