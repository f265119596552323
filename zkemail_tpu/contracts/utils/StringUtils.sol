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
}
