#!/usr/bin/env python
"""Regenerate tests/fixtures/dkim_keys.json from the reference .eml fixtures.

Usage: python scripts/recover_dkim_key.py [out.json]

See zkemail_tpu/helpers/key_recovery.py for the method (GCD over two
signatures of the same key — public information only).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from zkemail_tpu.helpers.key_recovery import recover_modulus  # noqa: E402

REF = Path("/root/reference/packages/helpers/tests/test-data")


def main():
    emails = [
        (REF / "email-good.eml").read_bytes(),
        (REF / "email-good-large.eml").read_bytes(),
    ]
    n = recover_modulus(emails)
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parents[2] / "tests/fixtures/dkim_keys.json"
    )
    obj = {
        "icloud.com:1a1hai": {
            "n": str(n),
            "e": 65537,
            "note": (
                "Recovered from the public DKIM signatures of the reference's "
                "bundled email-good.eml and email-good-large.eml via "
                "zkemail_tpu.helpers.key_recovery (GCD of s^e - EM(m)); "
                "enables hermetic runs of the reference fixture matrix "
                "without DNS."
            ),
        }
    }
    out.write_text(json.dumps(obj, indent=2))
    print(f"wrote {out} (n: {n.bit_length()} bits)")


if __name__ == "__main__":
    main()
