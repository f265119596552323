"""Array / byte / base64 / Poseidon gadget tests vs host references."""

import base64 as b64mod

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.circuits.gadgets import arrays as A
from zkemail_tpu.circuits.gadgets import bytes as BY
from zkemail_tpu.circuits.gadgets.base64 import base64_decode
from zkemail_tpu.circuits.gadgets.poseidon_gadget import (
    poseidon_hash,
    poseidon_large,
    poseidon_modular,
)
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.core import poseidon as POS
from zkemail_tpu.helpers.binary_format import pack_bytes_to_fields

P = POS.FR_P if hasattr(POS, "FR_P") else None
from zkemail_tpu.core.field import R as FR


def run(cs, inputs, batch=1):
    cc = cs.compile()
    w = cc.eval_witness(inputs, batch)
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, 0]))]
    return cc, vals


def val_of(cc, vals, sv):
    flat = sv.idx.reshape(-1)
    out = [vals[int(cc.perm[i])] for i in flat]
    return out if len(out) > 1 else out[0]


def test_item_at_index_and_total():
    cs = ConstraintSystem("t")
    arr = cs.add_input("arr", (8,))
    idx = cs.add_input("idx", ())
    out = A.item_at_index(cs, arr, idx)
    tot = A.calculate_total(cs, arr)
    cc, vals = run(
        cs,
        {
            "arr": jnp.asarray(np.arange(10, 18, dtype=np.int32)[:, None]),
            "idx": jnp.asarray([5], dtype=np.int32),
        },
    )
    assert cc.check_satisfied_host(vals)
    assert val_of(cc, vals, out) == 15
    assert val_of(cc, vals, tot) == sum(range(10, 18))


def test_var_shift_left_and_subarray():
    cs = ConstraintSystem("t")
    arr = cs.add_input("arr", (8,))
    shift = cs.add_input("shift", ())
    length = cs.add_input("length", ())
    shifted = A.var_shift_left(cs, arr, shift, 8)
    sub = A.select_sub_array(cs, arr, shift, length, 4)
    cc, vals = run(
        cs,
        {
            "arr": jnp.asarray(np.arange(1, 9, dtype=np.int32)[:, None]),
            "shift": jnp.asarray([3], dtype=np.int32),
            "length": jnp.asarray([2], dtype=np.int32),
        },
    )
    assert cc.check_satisfied_host(vals)
    assert val_of(cc, vals, shifted) == [4, 5, 6, 7, 8, 0, 0, 0]
    assert val_of(cc, vals, sub) == [4, 5, 0, 0]


def test_assert_zero_padding():
    cs = ConstraintSystem("t")
    arr = cs.add_input("arr", (6,))
    ln = cs.add_input("len", ())
    A.assert_zero_padding(cs, arr, ln)
    cc, vals = run(
        cs,
        {
            "arr": jnp.asarray(np.array([5, 6, 7, 0, 0, 0], dtype=np.int32)[:, None]),
            "len": jnp.asarray([3], dtype=np.int32),
        },
    )
    assert cc.check_satisfied_host(vals)
    # non-zero tail must fail
    cs2 = ConstraintSystem("t2")
    arr2 = cs2.add_input("arr", (6,))
    ln2 = cs2.add_input("len", ())
    A.assert_zero_padding(cs2, arr2, ln2)
    cc2, vals2 = run(
        cs2,
        {
            "arr": jnp.asarray(np.array([5, 6, 7, 0, 9, 0], dtype=np.int32)[:, None]),
            "len": jnp.asarray([3], dtype=np.int32),
        },
    )
    assert not cc2.check_satisfied_host(vals2)


def test_count_substring_occurrences():
    cs = ConstraintSystem("t")
    arr = cs.add_input("arr", (10,))
    sub = cs.add_input("sub", (2,))
    cnt = A.count_substring_occurrences(cs, arr, sub)
    data = np.frombuffer(b"abcabcabxa", dtype=np.uint8).astype(np.int32)
    cc, vals = run(
        cs,
        {
            "arr": jnp.asarray(data[:, None]),
            "sub": jnp.asarray(np.frombuffer(b"ab", dtype=np.uint8).astype(np.int32)[:, None]),
        },
    )
    assert cc.check_satisfied_host(vals)
    assert val_of(cc, vals, cnt) == 3


def test_pack_bytes_matches_host():
    cs = ConstraintSystem("t")
    data = cs.add_input("data", (40,))
    packed = BY.pack_bytes(cs, data)
    raw = bytes(range(1, 41))
    cc, vals = run(cs, {"data": jnp.asarray(np.frombuffer(raw, np.uint8).astype(np.int32)[:, None])})
    assert cc.check_satisfied_host(vals)
    assert val_of(cc, vals, packed) == pack_bytes_to_fields(raw)


def test_split_bytes_to_words():
    cs = ConstraintSystem("t")
    data = cs.add_input("data", (32,))
    words = BY.split_bytes_to_words(cs, data, 121, 3)
    raw = bytes(range(100, 132))
    cc, vals = run(cs, {"data": jnp.asarray(np.frombuffer(raw, np.uint8).astype(np.int32)[:, None])})
    assert cc.check_satisfied_host(vals)
    as_int = int.from_bytes(raw, "big")
    mask = (1 << 121) - 1
    expect = [(as_int >> (121 * i)) & mask for i in range(3)]
    assert val_of(cc, vals, words) == expect


def test_base64_decode():
    raw = bytes(range(32))
    enc = b64mod.b64encode(raw)  # 44 chars
    cs = ConstraintSystem("t")
    chars = cs.add_input("chars", (44,))
    out = base64_decode(cs, chars, 32)
    cc, vals = run(cs, {"chars": jnp.asarray(np.frombuffer(enc, np.uint8).astype(np.int32)[:, None])})
    assert cc.check_satisfied_host(vals)
    assert bytes(val_of(cc, vals, out)) == raw


def test_poseidon_gadget_matches_host():
    cs = ConstraintSystem("t")
    x = cs.add_input("x", (2,))
    h = poseidon_hash(cs, x)
    cc, vals = run(
        cs, {"x": jnp.asarray(np.array([[1], [2]], dtype=np.int32))}
    )
    assert cc.check_satisfied_host(vals)
    assert val_of(cc, vals, h) == POS.poseidon([1, 2])


def test_poseidon_large_gadget():
    modulus = (1 << 2040) + 987654321  # fits 17x121 limbs
    limbs_vals = [(modulus >> (121 * i)) & ((1 << 121) - 1) for i in range(17)]
    cs = ConstraintSystem("t")
    limbs = cs.add_input("limbs", (17,), dtype="fr")
    h = poseidon_large(cs, limbs)
    arr = LB.ints_to_limbs(np.array(limbs_vals, dtype=object)[:, None])
    cc, vals = run(cs, {"limbs": jnp.asarray(arr)})
    assert cc.check_satisfied_host(vals)
    assert val_of(cc, vals, h) == POS.poseidon_large(modulus, 121, 9)


def test_poseidon_modular_gadget():
    n = 20
    ins = list(range(1, n + 1))
    cs = ConstraintSystem("t")
    x = cs.add_input("x", (n,))
    h = poseidon_modular(cs, x)
    cc, vals = run(cs, {"x": jnp.asarray(np.array(ins, dtype=np.int32)[:, None])})
    assert cc.check_satisfied_host(vals)
    assert val_of(cc, vals, h) == POS.poseidon_modular(ins)
