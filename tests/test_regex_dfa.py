"""Regex compiler + DFA matching gadget tests (the zk-regex role)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.circuits.gadgets.regex_dfa import dfa_match_gadget
from zkemail_tpu.circuits.regex_compiler import (
    BODY_HASH_PATTERN,
    compile_regex,
    dfa_match,
)
from zkemail_tpu.core import limbs as LB


def test_compiler_host_matching():
    dfa = compile_regex(r"ab+c", anchored=True)
    assert dfa_match(dfa, b"abbbc")[0]
    assert not dfa_match(dfa, b"ac", anchored=True)[0]
    dfa2 = compile_regex(r"a(b|c)d", anchored=False)
    assert dfa_match(dfa2, b"xxabdyy")[0]
    assert dfa_match(dfa2, b"xxacdyy")[0]
    assert not dfa_match(dfa2, b"xxaddyy")[0]


def test_compiler_reveal_groups():
    dfa = compile_regex(BODY_HASH_PATTERN, reveal_groups={0}, anchored=False)
    header = b"v=1; a=rsa-sha256; bh=QmFzZTY0SGFzaFZhbHVlMTIzNDU2Nzg5MDEyMw==; b=xyz"
    ok, reveals = dfa_match(dfa, header)
    assert ok
    assert reveals[0] == b"QmFzZTY0SGFzaFZhbHVlMTIzNDU2Nzg5MDEyMw=="


def run_gadget(pattern, data_bytes, max_len=48, reveal_groups=None, anchored=False):
    dfa = compile_regex(pattern, reveal_groups=reveal_groups, anchored=anchored)
    cs = ConstraintSystem("regex")
    data = cs.add_input("data", (max_len,))
    is_match, reveal = dfa_match_gadget(
        cs, data, dfa, n_reveal_groups=1 if reveal_groups else 1
    )
    cs.mark_public(is_match)
    cc = cs.compile()
    arr = np.zeros((max_len, 1), dtype=np.int32)
    arr[: len(data_bytes), 0] = np.frombuffer(data_bytes, dtype=np.uint8)
    w = cc.eval_witness({"data": jnp.asarray(arr)}, 1)
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, 0]))]
    assert cc.check_satisfied_host(vals), "R1CS must be satisfied"
    match_val = vals[int(cc.perm[is_match.idx])]
    reveal_vals = [vals[int(cc.perm[i])] for i in reveal.idx[0]]
    return match_val, bytes(v for v in reveal_vals if v), cc, vals


def test_gadget_simple_match():
    m, _, cc, _ = run_gadget(r"abc", b"xxabcxx")
    assert m == 1
    m2, _, _, _ = run_gadget(r"abc", b"xxabxcx")
    assert m2 == 0


def test_gadget_reveal_body_hash():
    header = b"x; bh=SGVsbG8=; b=sig"
    m, revealed, cc, vals = run_gadget(
        BODY_HASH_PATTERN, header, max_len=32, reveal_groups={0}
    )
    assert m == 1
    assert revealed == b"SGVsbG8="


def test_gadget_rejects_forged_state_path():
    """Flipping a state one-hot bit must break satisfaction."""
    m, _, cc, vals = run_gadget(r"ab", b"ab")
    bad = list(vals)
    # find a dfa_state signal and flip it
    for step in cc.steps:
        if step.name == "dfa_states":
            sig = int(cc.perm[step.out_idx[5]])
            bad[sig] = 1 - bad[sig]
            break
    assert not cc.check_satisfied_host(bad)
