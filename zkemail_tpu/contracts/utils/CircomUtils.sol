// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

/// @title Packing utilities matching the circuit's PackBytes layout.
/// Semantic parity with packages/contracts/utils/CircomUtils.sol:41 —
/// 31 bytes per field element, little-endian within each element, so
/// on-chain code can reconstruct strings revealed by the circuit.
library CircomUtils {
    uint256 internal constant BYTES_PER_FIELD = 31;

    /// @notice Pack raw bytes into field elements (31 bytes LE each)
    function packFieldsArray(bytes memory data)
        internal
        pure
        returns (uint256[] memory fields)
    {
        uint256 n = (data.length + BYTES_PER_FIELD - 1) / BYTES_PER_FIELD;
        fields = new uint256[](n);
        for (uint256 k = 0; k < n; k++) {
            uint256 acc = 0;
            for (uint256 j = 0; j < BYTES_PER_FIELD; j++) {
                uint256 i = k * BYTES_PER_FIELD + j;
                if (i >= data.length) break;
                acc |= uint256(uint8(data[i])) << (8 * j);
            }
            fields[k] = acc;
        }
    }

    /// @notice Unpack field elements back into bytes (inverse of packFieldsArray)
    function unpackFieldsArray(uint256[] memory fields, uint256 byteLength)
        internal
        pure
        returns (bytes memory out)
    {
        out = new bytes(byteLength);
        for (uint256 i = 0; i < byteLength; i++) {
            uint256 k = i / BYTES_PER_FIELD;
            uint256 j = i % BYTES_PER_FIELD;
            out[i] = bytes1(uint8((fields[k] >> (8 * j)) & 0xFF));
        }
    }
}
