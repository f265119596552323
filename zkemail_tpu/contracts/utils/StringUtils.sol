// SPDX-License-Identifier: MIT
pragma solidity ^0.8.13;

/// @title On-chain string helpers for circuit-packed signals.
/// Semantic parity with packages/contracts/utils/StringUtils.sol:5 —
/// decode PackBytes field elements into strings on-chain
/// (convertPackedBytesToString:76-88), extract domains from addresses
/// (getDomainFromEmail:170), case and hex helpers.
library StringUtils {
    uint256 internal constant PACK_SIZE = 31;

    /// @notice Decode circuit-packed (31-byte LE) field elements to a string,
    /// stopping at the first NUL.
    function convertPackedBytesToString(
        uint256[] memory packedBytes,
        uint256 signals,
        uint256 packSize
    ) internal pure returns (string memory) {
        uint8 state = 0; // 0 = reading, 1 = seen null
        bytes memory nonzeros = new bytes(signals * packSize);
        uint256 count = 0;
        for (uint256 i = 0; i < signals; i++) {
            uint256 packed = packedBytes[i];
            for (uint256 j = 0; j < packSize; j++) {
                uint256 b = (packed >> (8 * j)) & 0xFF;
                if (b == 0) {
                    state = 1;
                } else {
                    require(state == 0, "non-zero after null");
                    nonzeros[count] = bytes1(uint8(b));
                    count++;
                }
            }
        }
        bytes memory out = new bytes(count);
        for (uint256 i = 0; i < count; i++) {
            out[i] = nonzeros[i];
        }
        return string(out);
    }

    /// @notice The domain part of an email address string
    function getDomainFromEmail(string memory fromEmail)
        internal
        pure
        returns (string memory)
    {
        bytes memory emailBytes = bytes(fromEmail);
        uint256 atIndex = emailBytes.length;
        for (uint256 i = 0; i < emailBytes.length; i++) {
            if (emailBytes[i] == "@") {
                atIndex = i;
                break;
            }
        }
        require(atIndex < emailBytes.length, "no @ in email");
        bytes memory out = new bytes(emailBytes.length - atIndex - 1);
        for (uint256 i = atIndex + 1; i < emailBytes.length; i++) {
            out[i - atIndex - 1] = emailBytes[i];
        }
        return string(out);
    }

    function lower(string memory str) internal pure returns (string memory) {
        bytes memory b = bytes(str);
        bytes memory out = new bytes(b.length);
        for (uint256 i = 0; i < b.length; i++) {
            uint8 c = uint8(b[i]);
            out[i] = (c >= 65 && c <= 90) ? bytes1(c + 32) : b[i];
        }
        return string(out);
    }

    function stringEq(string memory a, string memory b)
        internal
        pure
        returns (bool)
    {
        return keccak256(abi.encodePacked(a)) == keccak256(abi.encodePacked(b));
    }

    // ------------------------------------------------------------- hex/dec

    bytes16 private constant _SYMBOLS = "0123456789abcdef";

    /// @notice Fixed-length 0x-hex (reference toHexString:11-21)
    function toHexString(uint256 value, uint256 length)
        internal
        pure
        returns (string memory)
    {
        bytes memory buffer = new bytes(2 * length + 2);
        buffer[0] = "0";
        buffer[1] = "x";
        for (uint256 i = 2 * length + 1; i > 1; --i) {
            buffer[i] = _SYMBOLS[value & 0xf];
            value >>= 4;
        }
        require(value == 0, "Strings: hex length insufficient");
        return string(buffer);
    }

    function toHexStringNoPrefix(uint256 value, uint256 length)
        internal
        pure
        returns (string memory)
    {
        bytes memory buffer = new bytes(2 * length);
        for (uint256 i = 2 * length; i > 0; --i) {
            buffer[i - 1] = _SYMBOLS[value & 0xf];
            value >>= 4;
        }
        return string(buffer);
    }

    /// @notice Hex rendering of raw bytes (reference toString(bytes):48-61)
    function toString(bytes memory data) internal pure returns (string memory) {
        bytes memory str = new bytes(2 + data.length * 2);
        str[0] = "0";
        str[1] = "x";
        for (uint256 i = 0; i < data.length; i++) {
            str[2 + i * 2] = _SYMBOLS[uint8(data[i] >> 4)];
            str[3 + i * 2] = _SYMBOLS[uint8(data[i] & 0x0f)];
        }
        return string(str);
    }

    function toString(uint256 value) internal pure returns (string memory) {
        return toString(abi.encodePacked(value));
    }

    function toString(bytes32 value) internal pure returns (string memory) {
        return toString(abi.encodePacked(value));
    }

    function toString(address account) internal pure returns (string memory) {
        return toString(abi.encodePacked(account));
    }

    /// @notice Decimal string -> uint; truncates at a '.' (reference :153-168)
    function stringToUint(string memory s) internal pure returns (uint256) {
        bytes memory b = bytes(s);
        uint256 result = 0;
        for (uint256 i = 0; i < b.length; i++) {
            if (b[i] >= 0x30 && b[i] <= 0x39) {
                result = result * 10 + (uint256(uint8(b[i])) - 48);
            }
            if (b[i] == 0x2E) {
                return result;
            }
        }
        return result;
    }

    // ------------------------------------------------------------ packing

    /// @notice Single packed field element -> string (reference :63-71)
    function convertPackedByteToString(uint256 packedByte, uint256 packSize)
        internal
        pure
        returns (string memory)
    {
        uint256[] memory packed = new uint256[](1);
        packed[0] = packedByte;
        return convertPackedBytesToString(packed, 1, packSize);
    }

    /// @notice Convenience overload without the max-signal check (reference :73-86)
    function convertPackedBytesToString(uint256[] memory packedBytes)
        internal
        pure
        returns (string memory)
    {
        return
            convertPackedBytesToString(packedBytes, packedBytes.length, PACK_SIZE);
    }

    // ------------------------------------------------------------- strings

    /// @notice bytes32 -> string truncated at the first NUL (reference :132-141)
    function bytes32ToString(bytes32 input) internal pure returns (string memory) {
        uint256 i;
        for (i = 0; i < 32 && input[i] != 0; i++) {}
        bytes memory resultBytes = new bytes(i);
        for (i = 0; i < 32 && input[i] != 0; i++) {
            resultBytes[i] = input[i];
        }
        return string(resultBytes);
    }

    function sliceArray(uint256[] memory input, uint256 start, uint256 end)
        internal
        pure
        returns (uint256[] memory)
    {
        require(start <= end && end <= input.length, "Invalid slice indices");
        uint256[] memory result = new uint256[](end - start);
        for (uint256 i = start; i < end; i++) {
            result[i - start] = input[i];
        }
        return result;
    }

    /// @notice Truncate a string at the first NUL byte (reference :187-203)
    function removeTrailingZeros(string memory input)
        internal
        pure
        returns (string memory)
    {
        bytes memory inputBytes = bytes(input);
        uint256 endIndex = inputBytes.length;
        for (uint256 i = 0; i < inputBytes.length; i++) {
            if (inputBytes[i] == 0) {
                endIndex = i;
                break;
            }
        }
        bytes memory resultBytes = new bytes(endIndex);
        for (uint256 i = 0; i < endIndex; i++) {
            resultBytes[i] = inputBytes[i];
        }
        return string(resultBytes);
    }

    function upper(string memory str) internal pure returns (string memory) {
        bytes memory b = bytes(str);
        bytes memory out = new bytes(b.length);
        for (uint256 i = 0; i < b.length; i++) {
            uint8 c = uint8(b[i]);
            out[i] = (c >= 97 && c <= 122) ? bytes1(c - 32) : b[i];
        }
        return string(out);
    }
}
