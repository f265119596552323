// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

/// @title Packing utilities matching the circuit's PackBytes layout.
/// ABI + semantic parity with packages/contracts/utils/CircomUtils.sol —
/// 31 bytes per field element, little-endian within each element, so
/// on-chain code can reconstruct strings revealed by the circuit. The
/// bytes32[]/paddedSize forms mirror the reference signatures exactly;
/// the uint256[] forms are retained convenience overloads.
library CircomUtils {
    uint256 internal constant BYTES_PER_FIELD = 31;

    /// @notice The ZK circuit expects a fixed public-input count
    error InvalidPublicInputsLength();

    /// @notice Input longer than the declared padded size
    error InvalidDataLength();

    /// @notice Pack bytes into 31-byte LE field elements, zero-padded out to
    /// paddedSize bytes (reference CircomUtils.packFieldsArray signature).
    function packFieldsArray(bytes memory input, uint256 paddedSize)
        internal
        pure
        returns (bytes32[] memory fields)
    {
        if (input.length > paddedSize) revert InvalidDataLength();
        uint256 n = (paddedSize + BYTES_PER_FIELD - 1) / BYTES_PER_FIELD;
        fields = new bytes32[](n);
        for (uint256 k = 0; k < n; k++) {
            uint256 acc = 0;
            for (uint256 j = 0; j < BYTES_PER_FIELD; j++) {
                uint256 i = k * BYTES_PER_FIELD + j;
                if (i >= paddedSize) break;
                if (i < input.length) {
                    acc |= uint256(uint8(input[i])) << (8 * j);
                }
            }
            fields[k] = bytes32(acc);
        }
    }

    /// @notice Pack a boolean as a single field element (reference packBool).
    function packBool(bool input) internal pure returns (bytes32[] memory fields) {
        fields = new bytes32[](1);
        fields[0] = bytes32(uint256(input ? 1 : 0));
    }

    /// @notice Unpack 31-byte LE field elements back to bytes, trimming
    /// trailing zero bytes (reference unpackFieldsArray signature).
    function unpackFieldsArray(bytes32[] memory fields, uint256 paddedSize)
        internal
        pure
        returns (bytes memory result)
    {
        // reads fields[0..ceil(paddedSize/31)) unconditionally — an
        // undersized fields array panics with the array-OOB code, matching
        // the reference's behavior
        uint256 n = (paddedSize + BYTES_PER_FIELD - 1) / BYTES_PER_FIELD;
        bytes memory raw = new bytes(paddedSize);
        uint256 w = 0;
        for (uint256 i = 0; i < n; i++) {
            uint256 f = uint256(fields[i]);
            for (uint256 j = 0; j < BYTES_PER_FIELD && w < paddedSize; j++) {
                raw[w++] = bytes1(uint8(f & 0xFF));
                f >>= 8;
            }
        }
        uint256 actual = 0;
        for (uint256 i = 0; i < raw.length; i++) {
            if (raw[i] != 0) actual = i + 1;
        }
        result = new bytes(actual);
        for (uint256 i = 0; i < actual; i++) {
            result[i] = raw[i];
        }
    }

    /// @notice Unpack a boolean from the first field element.
    function unpackBool(bytes32[] memory fields) internal pure returns (bool result) {
        return uint256(fields[0]) == 1;
    }

    /// @notice Convenience overload: pack with no explicit padding
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

    /// @notice Convenience overload: unpack to an exact byte length
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
