// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

import {IERC7969} from "./interfaces/IERC7969.sol";

interface IERC1271 {
    function isValidSignature(bytes32 hash, bytes memory signature)
        external
        view
        returns (bytes4 magicValue);
}

interface IOwnable {
    function owner() external view returns (address);
}

/// @title DKIM registry with a main authorizer plus per-user overrides.
///
/// Semantic parity with packages/contracts/UserOverrideableDKIMRegistry.sol:19
/// (no OpenZeppelin dependency — own Ownable / ECDSA-recover / UUPS slot):
///   * three-level set keying domainHash x keyHash x authorizer; revocations
///     and reactivations keyed keyHash x authorizer (reference :43-56);
///   * threshold validity (:396-444): a main-authorizer approval counts 1
///     before `setTimestampDelay` elapses and 2 after; a user approval counts
///     2; valid needs setThreshold >= 2 and revokeThreshold == 0, where a
///     user revocation counts 2, a main revocation 1, and a user reactivation
///     cancels a lone main revocation;
///   * relayer flows (:140-182): anyone may submit set/revoke/reactivate on
///     behalf of `authorizer` given an EIP-191 ECDSA signature (EOA) or an
///     EIP-1271 contract signature over computeSignedMsg(prefix, domain, key);
///   * UUPS upgradeability (:19-23, :444-449): ERC-1967 implementation slot +
///     owner-gated upgradeTo, minimal equivalent of OZ UUPSUpgradeable.
contract UserOverrideableDKIMRegistry is IERC7969 {
    /// ERC-1967 implementation slot: keccak256("eip1967.proxy.implementation") - 1
    bytes32 internal constant _IMPLEMENTATION_SLOT =
        0x360894a13ba1a3210667c828492db98dca3e2076cc3735a920a3ca505d382bbc;

    address public owner;
    address public mainAuthorizer;
    uint256 public setTimestampDelay;
    bool private _initialized;

    // domainHash => keyHash => authorizer => approved
    mapping(bytes32 => mapping(bytes32 => mapping(address => bool)))
        public dkimPublicKeyHashes;
    // keyHash => authorizer => revoked       (reference :47-48: no domain key)
    mapping(bytes32 => mapping(address => bool)) public revokedDKIMPublicKeyHashes;
    // keyHash => authorizer => reactivated
    mapping(bytes32 => mapping(address => bool))
        public reactivatedDKIMPublicKeyHashes;
    // keyHash => time when the main authorizer's approval becomes full-weight
    mapping(bytes32 => uint256) public enabledTimeOfDKIMPublicKeyHash;

    string public constant SET_PREFIX = "SET:";
    string public constant REVOKE_PREFIX = "REVOKE:";
    string public constant REACTIVATE_PREFIX = "REACTIVATE:";

    event KeyHashReactivated(bytes32 indexed publicKeyHash, address indexed authorizer);
    event MainAuthorizerChanged(address indexed newMainAuthorizer);
    event Upgraded(address indexed implementation);

    modifier onlyOwner() {
        require(msg.sender == owner, "not the owner");
        _;
    }

    /// @notice Initializer (the reference is deployed behind a UUPS proxy).
    function initialize(
        address _initialOwner,
        address _mainAuthorizer,
        uint256 _setTimestampDelay
    ) public {
        require(!_initialized, "already initialized");
        _initialized = true;
        owner = _initialOwner;
        mainAuthorizer = _mainAuthorizer;
        setTimestampDelay = _setTimestampDelay;
    }

    // ------------------------------------------------------------ validity

    /// @notice ERC-7969 view; the authorizer is resolved as the caller
    /// contract's owner (reference :86-90).
    function isKeyHashValid(bytes32 domainNameHash, bytes32 publicKeyHash)
        public
        view
        returns (bool)
    {
        return isKeyHashValid(domainNameHash, publicKeyHash, IOwnable(msg.sender).owner());
    }

    function isKeyHashValid(
        bytes32 domainNameHash,
        bytes32 publicKeyHash,
        address authorizer
    ) public view returns (bool) {
        require(domainNameHash != bytes32(0), "domain name cannot be zero");
        require(publicKeyHash != bytes32(0), "public key hash cannot be zero");
        require(authorizer != address(0), "authorizer address cannot be zero");
        require(authorizer != mainAuthorizer, "authorizer cannot be mainAuthorizer");
        if (_computeRevokeThreshold(publicKeyHash, authorizer) >= 1) return false;
        return _computeSetThreshold(domainNameHash, publicKeyHash, authorizer) >= 2;
    }

    // ------------------------------------------------------------ mutations

    function setDKIMPublicKeyHash(
        string memory domainName,
        bytes32 publicKeyHash,
        address authorizer,
        bytes memory signature
    ) public {
        require(bytes(domainName).length > 0, "domain name cannot be zero");
        require(publicKeyHash != bytes32(0), "public key hash cannot be zero");
        require(authorizer != address(0), "authorizer address cannot be zero");
        bytes32 domainNameHash = keccak256(bytes(domainName));
        require(
            !dkimPublicKeyHashes[domainNameHash][publicKeyHash][authorizer],
            "public key hash is already set"
        );
        require(
            !revokedDKIMPublicKeyHashes[publicKeyHash][authorizer],
            "public key hash is already revoked"
        );
        if (msg.sender != authorizer) {
            _checkSignature(SET_PREFIX, domainName, publicKeyHash, authorizer, signature);
        }
        dkimPublicKeyHashes[domainNameHash][publicKeyHash][authorizer] = true;
        if (authorizer == mainAuthorizer) {
            enabledTimeOfDKIMPublicKeyHash[publicKeyHash] =
                block.timestamp + setTimestampDelay;
        }
        emit KeyHashRegistered(domainNameHash, publicKeyHash);
    }

    function setDKIMPublicKeyHashes(
        string[] memory domainNames,
        bytes32[] memory publicKeyHashes,
        address[] memory authorizers,
        bytes[] memory signatures
    ) public {
        require(domainNames.length == publicKeyHashes.length, "invalid publicKeyHashes length");
        require(domainNames.length == authorizers.length, "invalid authorizers length");
        require(domainNames.length == signatures.length, "invalid signatures length");
        for (uint256 i = 0; i < domainNames.length; i++) {
            setDKIMPublicKeyHash(domainNames[i], publicKeyHashes[i], authorizers[i], signatures[i]);
        }
    }

    function revokeDKIMPublicKeyHash(
        string memory domainName,
        bytes32 publicKeyHash,
        address authorizer,
        bytes memory signature
    ) public {
        require(bytes(domainName).length > 0, "domain name cannot be zero");
        require(publicKeyHash != bytes32(0), "public key hash cannot be zero");
        require(authorizer != address(0), "authorizer address cannot be zero");
        require(
            !revokedDKIMPublicKeyHashes[publicKeyHash][authorizer],
            "public key hash is already revoked"
        );
        if (msg.sender != authorizer) {
            _checkSignature(REVOKE_PREFIX, domainName, publicKeyHash, authorizer, signature);
        }
        revokedDKIMPublicKeyHashes[publicKeyHash][authorizer] = true;
        emit KeyHashRevoked(keccak256(bytes(domainName)), publicKeyHash);
    }

    function reactivateDKIMPublicKeyHash(
        string memory domainName,
        bytes32 publicKeyHash,
        address authorizer,
        bytes memory signature
    ) public {
        require(bytes(domainName).length > 0, "domain name cannot be zero");
        require(publicKeyHash != bytes32(0), "public key hash cannot be zero");
        require(authorizer != address(0), "authorizer address cannot be zero");
        require(
            authorizer != mainAuthorizer,
            "mainAuthorizer cannot reactivate the public key hash"
        );
        require(
            !reactivatedDKIMPublicKeyHashes[publicKeyHash][authorizer],
            "public key hash is already reactivated"
        );
        require(
            _computeRevokeThreshold(publicKeyHash, authorizer) == 1,
            "revoke threshold must be one"
        );
        require(
            _computeSetThreshold(keccak256(bytes(domainName)), publicKeyHash, authorizer) >= 2,
            "set threshold must be larger than two"
        );
        if (msg.sender != authorizer) {
            _checkSignature(REACTIVATE_PREFIX, domainName, publicKeyHash, authorizer, signature);
        }
        reactivatedDKIMPublicKeyHashes[publicKeyHash][authorizer] = true;
        emit KeyHashReactivated(publicKeyHash, authorizer);
    }

    function changeMainAuthorizer(address newMainAuthorizer) public onlyOwner {
        require(newMainAuthorizer != address(0), "newMainAuthorizer address cannot be zero");
        require(
            newMainAuthorizer != mainAuthorizer,
            "newMainAuthorizer address cannot be the same as the current mainAuthorizer"
        );
        mainAuthorizer = newMainAuthorizer;
        emit MainAuthorizerChanged(newMainAuthorizer);
    }

    // ------------------------------------------------------------ signatures

    function computeSignedMsg(
        string memory prefix,
        string memory domainName,
        bytes32 publicKeyHash
    ) public pure returns (string memory) {
        return string.concat(
            prefix,
            "domain=",
            domainName,
            ";public_key_hash=",
            _toHexString(uint256(publicKeyHash)),
            ";"
        );
    }

    function _checkSignature(
        string memory prefix,
        string memory domainName,
        bytes32 publicKeyHash,
        address authorizer,
        bytes memory signature
    ) internal view {
        bytes memory signedMsg = bytes(computeSignedMsg(prefix, domainName, publicKeyHash));
        bytes32 digest = keccak256(
            abi.encodePacked(
                "\x19Ethereum Signed Message:\n",
                _toDecimalString(signedMsg.length),
                signedMsg
            )
        );
        if (authorizer.code.length > 0) {
            require(
                IERC1271(authorizer).isValidSignature(digest, signature) == 0x1626ba7e,
                "invalid eip1271 signature"
            );
        } else {
            require(_recover(digest, signature) == authorizer, "invalid ecdsa signature");
        }
    }

    function _recover(bytes32 digest, bytes memory signature) internal pure returns (address) {
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
        address signer = ecrecover(digest, v, r, s);
        require(signer != address(0), "invalid signature");
        return signer;
    }

    // ------------------------------------------------------------ UUPS

    /// @notice ERC-1822 proxiable UUID (the ERC-1967 implementation slot).
    function proxiableUUID() external pure returns (bytes32) {
        return _IMPLEMENTATION_SLOT;
    }

    /// @notice Owner-gated upgrade: stores the new implementation in the
    /// ERC-1967 slot (reference _authorizeUpgrade is onlyOwner, :444-449).
    function upgradeTo(address newImplementation) external onlyOwner {
        require(newImplementation.code.length > 0, "implementation has no code");
        assembly {
            sstore(_IMPLEMENTATION_SLOT, newImplementation)
        }
        emit Upgraded(newImplementation);
    }

    // ------------------------------------------------------------ strings

    bytes16 private constant _HEX = "0123456789abcdef";

    function _toHexString(uint256 value) internal pure returns (string memory) {
        // 0x-prefixed minimal-length lowercase hex (OZ Strings.toHexString)
        uint256 length = 0;
        for (uint256 tmp = value; tmp != 0; tmp >>= 8) length++;
        if (length == 0) length = 1;
        bytes memory buffer = new bytes(2 * length + 2);
        buffer[0] = "0";
        buffer[1] = "x";
        for (uint256 i = 2 * length + 1; i > 1; i--) {
            buffer[i] = _HEX[value & 0xf];
            value >>= 4;
        }
        return string(buffer);
    }

    function _toDecimalString(uint256 value) internal pure returns (string memory) {
        if (value == 0) return "0";
        uint256 digits;
        for (uint256 tmp = value; tmp != 0; tmp /= 10) digits++;
        bytes memory buffer = new bytes(digits);
        while (value != 0) {
            digits--;
            buffer[digits] = bytes1(uint8(48 + (value % 10)));
            value /= 10;
        }
        return string(buffer);
    }

    function _computeSetThreshold(
        bytes32 domainNameHash,
        bytes32 publicKeyHash,
        address authorizer
    ) private view returns (uint256 threshold) {
        if (dkimPublicKeyHashes[domainNameHash][publicKeyHash][mainAuthorizer]) {
            threshold += block.timestamp < enabledTimeOfDKIMPublicKeyHash[publicKeyHash] ? 1 : 2;
        }
        if (dkimPublicKeyHashes[domainNameHash][publicKeyHash][authorizer]) {
            threshold += 2;
        }
    }

    function _computeRevokeThreshold(bytes32 publicKeyHash, address authorizer)
        private
        view
        returns (uint256 threshold)
    {
        if (revokedDKIMPublicKeyHashes[publicKeyHash][mainAuthorizer]) threshold += 1;
        if (revokedDKIMPublicKeyHashes[publicKeyHash][authorizer]) threshold += 2;
        if (threshold == 1 && reactivatedDKIMPublicKeyHashes[publicKeyHash][authorizer]) {
            threshold -= 1;
        }
    }
}
