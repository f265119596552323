"""Soft-line-break / nullifier / reveal-substring / clean-address gadgets."""

import jax.numpy as jnp
import numpy as np

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.circuits.gadgets.clean_email import clean_email_address, clean_email_host
from zkemail_tpu.circuits.gadgets.email_helpers import (
    email_nullifier,
    remove_soft_line_breaks,
    reveal_substring,
)
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.core.poseidon import poseidon, poseidon_large


def run(cs, inputs, batch=1):
    cc = cs.compile()
    w = cc.eval_witness(inputs, batch)
    return cc, w


def test_remove_soft_line_breaks_gadget():
    n = 24
    enc = b"hello=\r\nworld=\r\n!!"
    dec = b"helloworld!!"
    enc_p = enc + b"\x00" * (n - len(enc))
    dec_p = dec + b"\x00" * (n - len(dec))
    cs = ConstraintSystem("slb")
    e = cs.add_input("enc", (n,))
    d = cs.add_input("dec", (n,))
    remove_soft_line_breaks(cs, e, d)
    cc, w = run(
        cs,
        {
            "enc": jnp.asarray(np.frombuffer(enc_p, np.uint8).astype(np.int32)[:, None]),
            "dec": jnp.asarray(np.frombuffer(dec_p, np.uint8).astype(np.int32)[:, None]),
        },
    )
    assert cc.check_satisfied_device(w[:, :, 0])
    # wrong decoded body must fail
    bad = bytearray(dec_p)
    bad[0] ^= 1
    cs2 = ConstraintSystem("slb2")
    e2 = cs2.add_input("enc", (n,))
    d2 = cs2.add_input("dec", (n,))
    remove_soft_line_breaks(cs2, e2, d2)
    cc2, w2 = run(
        cs2,
        {
            "enc": jnp.asarray(np.frombuffer(enc_p, np.uint8).astype(np.int32)[:, None]),
            "dec": jnp.asarray(np.frombuffer(bytes(bad), np.uint8).astype(np.int32)[:, None]),
        },
    )
    assert not cc2.check_satisfied_device(w2[:, :, 0])


def test_email_nullifier_gadget():
    sig = 0xDEADBEEF << 1900 | 0xC0FFEE
    limbs = [(sig >> (121 * i)) & ((1 << 121) - 1) for i in range(17)]
    cs = ConstraintSystem("null")
    s = cs.add_input("sig", (17,), dtype="fr")
    out = email_nullifier(cs, s)
    cc, w = run(
        cs, {"sig": jnp.asarray(LB.ints_to_limbs(np.array(limbs, dtype=object)[:, None]))}
    )
    assert cc.check_satisfied_device(w[:, :, 0])
    vals = LB.limbs_to_ints(np.asarray(w[:, :, 0]))
    got = int(vals[int(cc.perm[out.idx])])
    assert got == poseidon([poseidon_large(sig, 121, 9)])


def test_reveal_substring_gadget():
    n = 24
    text = b"find the NEEDLE here...."
    cs = ConstraintSystem("rs")
    t = cs.add_input("text", (n,))
    st = cs.add_input("start", ())
    ln = cs.add_input("len", ())
    sub = reveal_substring(cs, t, st, ln, 8, enforce_uniqueness=False)
    cc, w = run(
        cs,
        {
            "text": jnp.asarray(np.frombuffer(text, np.uint8).astype(np.int32)[:, None]),
            "start": jnp.asarray([9], dtype=np.int32),
            "len": jnp.asarray([6], dtype=np.int32),
        },
    )
    assert cc.check_satisfied_device(w[:, :, 0])
    vals = LB.limbs_to_ints(np.asarray(w[:, :, 0]))
    got = bytes(int(vals[int(cc.perm[i])]) for i in sub.idx)
    assert got == b"NEEDLE\x00\x00"


def test_clean_email_address_gadget():
    n = 32
    enc = b"first.last+tag@gmail.com"
    enc_p = enc + b"\x00" * (n - len(enc))
    dec_p = clean_email_host(enc_p)
    assert dec_p.rstrip(b"\x00") == b"firstlast@gmail.com"
    cs = ConstraintSystem("cea")
    e = cs.add_input("enc", (n,))
    d = cs.add_input("dec", (n,))
    clean_email_address(cs, e, d)
    cc, w = run(
        cs,
        {
            "enc": jnp.asarray(np.frombuffer(enc_p, np.uint8).astype(np.int32)[:, None]),
            "dec": jnp.asarray(np.frombuffer(dec_p, np.uint8).astype(np.int32)[:, None]),
        },
    )
    assert cc.check_satisfied_device(w[:, :, 0])
    # fake normalization must fail
    bad = bytearray(dec_p)
    bad[0] ^= 2
    cs2 = ConstraintSystem("cea2")
    e2 = cs2.add_input("enc", (n,))
    d2 = cs2.add_input("dec", (n,))
    clean_email_address(cs2, e2, d2)
    cc2, w2 = run(
        cs2,
        {
            "enc": jnp.asarray(np.frombuffer(enc_p, np.uint8).astype(np.int32)[:, None]),
            "dec": jnp.asarray(np.frombuffer(bytes(bad), np.uint8).astype(np.int32)[:, None]),
        },
    )
    assert not cc2.check_satisfied_device(w2[:, :, 0])
