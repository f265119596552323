"""SHA-256 circuit gadget: witness parity vs hashlib + R1CS satisfaction."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.circuits.gadgets.sha_wrappers import (
    pack_digest_hi_lo,
    sha256_bytes,
    sha256_bytes_partial,
)
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.helpers import sha_utils as SU


def digest_from_bits(cc, vals, digest_sv):
    """Reconstruct digest bytes from (8, 32) LSB-first bit signal values."""
    out = b""
    for wi in range(8):
        word = 0
        for j in range(32):
            word |= int(vals[int(cc.perm[digest_sv.idx[wi, j]])]) << j
        out += word.to_bytes(4, "big")
    return out


def build_and_run(max_len, messages, use_partial=False, prefix_blocks=1):
    cs = ConstraintSystem("sha_test")
    data = cs.add_input("data", (max_len,))
    plen = cs.add_input("len", ())
    if use_partial:
        mid = cs.add_input("midstate", (32,))
        digest, sha = sha256_bytes_partial(cs, data, plen, mid)
    else:
        digest, sha = sha256_bytes(cs, data, plen)
    hi, lo = pack_digest_hi_lo(cs, digest)
    cs.mark_public(hi)
    cs.mark_public(lo)
    cc = cs.compile()

    batch = len(messages)
    data_arr = np.zeros((max_len, batch), dtype=np.int32)
    len_arr = np.zeros((batch,), dtype=np.int32)
    mid_arr = np.zeros((32, batch), dtype=np.int32)
    expected = []
    for b, msg in enumerate(messages):
        if use_partial:
            full_padded, padded_len = SU.sha256_pad(msg, ((len(msg) + 9 + 63) // 64) * 64)
            cut = prefix_blocks * 64
            midstate = SU.partial_sha(full_padded[:cut])
            rem = full_padded[cut:]
            rem = rem + b"\x00" * (max_len - len(rem))
            data_arr[:, b] = np.frombuffer(rem[:max_len], dtype=np.uint8)
            len_arr[b] = padded_len - cut
            mid_arr[:, b] = np.frombuffer(midstate, dtype=np.uint8)
        else:
            padded, padded_len = SU.sha256_pad(msg, max_len)
            data_arr[:, b] = np.frombuffer(padded, dtype=np.uint8)
            len_arr[b] = padded_len
        expected.append(hashlib.sha256(msg).digest())

    inputs = {"data": jnp.asarray(data_arr), "len": jnp.asarray(len_arr)}
    if use_partial:
        inputs["midstate"] = jnp.asarray(mid_arr)
    w = cc.eval_witness(inputs, batch)
    return cc, w, digest, expected


@pytest.mark.parametrize("max_len", [128])
def test_sha256_bytes_matches_hashlib(max_len):
    msgs = [b"abc", b"x" * 55, b"y" * 64]
    cc, w, digest_sv, expected = build_and_run(max_len, msgs)
    for b, exp in enumerate(expected):
        vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, b]))]
        got = digest_from_bits(cc, vals, digest_sv)
        assert got == exp, f"batch {b}: {got.hex()} != {exp.hex()}"
        assert cc.check_satisfied_host(vals), f"R1CS unsatisfied for batch {b}"


def test_sha256_negative_tamper():
    cc, w, digest_sv, expected = build_and_run(128, [b"abc"])
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, 0]))]
    assert cc.check_satisfied_host(vals)
    # flip one digest bit -> unsatisfied
    bad = list(vals)
    sig = int(digest_sv.idx[0, 0])
    bad[int(cc.perm[sig])] = 1 - bad[int(cc.perm[sig])]
    assert not cc.check_satisfied_host(bad)


def test_sha256_partial_midstate():
    msgs = [b"A" * 100 + b"needle" + b"B" * 20]
    cc, w, digest_sv, expected = build_and_run(
        128, msgs, use_partial=True, prefix_blocks=1
    )
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, 0]))]
    got = digest_from_bits(cc, vals, digest_sv)
    assert got == expected[0]
    assert cc.check_satisfied_host(vals)
