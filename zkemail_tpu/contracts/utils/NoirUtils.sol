// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

uint256 constant FIELD_BYTES = 31;

/// @title Packing utilities for the Noir proving-system byte layout.
/// ABI + semantic parity with packages/contracts/utils/NoirUtils.sol —
/// 31-byte little-endian field packing plus the BoundedVec<u8> encoding
/// (one byte per field, length in the final field).
library NoirUtils {
    error InvalidLength();

    /// @notice Pack bytes as a Noir BoundedVec<u8>: numFields total fields,
    /// one byte each, with the LAST field holding the length. numFields
    /// includes the length slot, so input.length must be < numFields.
    function packBoundedVecU8(bytes memory input, uint256 numFields)
        internal
        pure
        returns (bytes32[] memory result)
    {
        if (input.length >= numFields) revert InvalidLength();
        result = new bytes32[](numFields);
        for (uint256 i = 0; i < input.length; i++) {
            result[i] = bytes32(uint256(uint8(input[i])));
        }
        result[numFields - 1] = bytes32(input.length);
    }

    /// @notice Pack bytes into numFields 31-byte LE field elements.
    function packFieldsArray(bytes memory input, uint256 numFields)
        internal
        pure
        returns (bytes32[] memory fieldElements)
    {
        if (input.length > numFields * FIELD_BYTES) revert InvalidLength();
        fieldElements = new bytes32[](numFields);
        for (uint256 i = 0; i < numFields; i++) {
            uint256 start = i * FIELD_BYTES;
            uint256 f = 0;
            for (uint256 j = 0; j < FIELD_BYTES; j++) {
                if (start + j >= input.length) break;
                f |= uint256(uint8(input[start + j])) << (8 * j);
            }
            fieldElements[i] = bytes32(f);
        }
    }

    /// @notice Inverse of packBoundedVecU8: length is read from the final
    /// field, data from the least-significant byte of each preceding field.
    function unpackBoundedVecU8(bytes32[] memory fields)
        internal
        pure
        returns (bytes memory result)
    {
        uint256 length = uint256(fields[fields.length - 1]);
        result = new bytes(length);
        for (uint256 i = 0; i < length; i++) {
            result[i] = bytes1(uint8(uint256(fields[i])));
        }
    }

    /// @notice Inverse of packFieldsArray, trimming trailing zero bytes.
    function unpackFieldsArray(bytes32[] memory fields)
        internal
        pure
        returns (bytes memory trimmed)
    {
        uint256 total = fields.length * FIELD_BYTES;
        bytes memory raw = new bytes(total);
        uint256 w = 0;
        for (uint256 i = 0; i < fields.length; i++) {
            uint256 f = uint256(fields[i]);
            for (uint256 j = 0; j < FIELD_BYTES && w < total; j++) {
                raw[w++] = bytes1(uint8(f & 0xFF));
                f >>= 8;
            }
        }
        uint256 actual = 0;
        for (uint256 i = 0; i < raw.length; i++) {
            if (raw[i] != 0) actual = i + 1;
        }
        trimmed = new bytes(actual);
        for (uint256 i = 0; i < actual; i++) {
            trimmed[i] = raw[i];
        }
    }
}
