// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

/// @title Packing utilities for the Noir proving-system byte layout.
/// Semantic parity with packages/contracts/utils/NoirUtils.sol:9-63 —
/// one byte per field element, big-endian order, plus the BoundedVec<u8>
/// encoding (storage array + length).
library NoirUtils {
    /// @notice Pack bytes as a Noir BoundedVec<u8>: maxLen fields (1 byte
    /// each) followed by the length field.
    function packBoundedVecU8(bytes memory data, uint256 maxLength)
        internal
        pure
        returns (uint256[] memory fields)
    {
        require(data.length <= maxLength, "NoirUtils: data exceeds maxLength");
        fields = new uint256[](maxLength + 1);
        for (uint256 i = 0; i < data.length; i++) {
            fields[i] = uint256(uint8(data[i]));
        }
        fields[maxLength] = data.length;
    }

    /// @notice Pack bytes one-per-field, big-endian order
    function packFieldsArray(bytes memory data)
        internal
        pure
        returns (uint256[] memory fields)
    {
        fields = new uint256[](data.length);
        for (uint256 i = 0; i < data.length; i++) {
            fields[i] = uint256(uint8(data[i]));
        }
    }

    /// @notice Inverse of packFieldsArray
    function unpackFieldsArray(uint256[] memory fields)
        internal
        pure
        returns (bytes memory out)
    {
        out = new bytes(fields.length);
        for (uint256 i = 0; i < fields.length; i++) {
            require(fields[i] < 256, "NoirUtils: field is not a byte");
            out[i] = bytes1(uint8(fields[i]));
        }
    }
}
