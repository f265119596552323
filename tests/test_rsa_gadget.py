"""RSA-2048 verifier gadget: end-to-end against a real PKCS#1 v1.5 signature."""

import hashlib

import jax.numpy as jnp
import numpy as np
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import padding, rsa

from zkemail_tpu.circuits.advice import rsa_advice, stack_advice
from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.circuits.gadgets.rsa import rsa_verifier_65537
from zkemail_tpu.core import limbs as LB

KEY = rsa.generate_private_key(public_exponent=65537, key_size=2048)


def digest_bits_input(digest: bytes) -> np.ndarray:
    """SHA digest bytes -> (8, 32, 1) word bits LSB-first."""
    out = np.zeros((8, 32, 1), dtype=np.int32)
    for wi in range(8):
        word = int.from_bytes(digest[4 * wi : 4 * wi + 4], "big")
        for j in range(32):
            out[wi, j, 0] = (word >> j) & 1
    return out


def build():
    cs = ConstraintSystem("rsa_test")
    sig = cs.add_input("sig", (17,), dtype="fr")
    mod = cs.add_input("mod", (17,), dtype="fr")
    dig = cs.add_input("digest_bits", (8, 32))
    rsa_verifier_65537(cs, sig, mod, dig)
    return cs.compile()


def limbs17(x: int) -> np.ndarray:
    mask = (1 << 121) - 1
    vals = [(x >> (121 * i)) & mask for i in range(17)]
    return LB.ints_to_limbs(np.array(vals, dtype=object)[:, None])


def run_case(cc, msg: bytes, tamper=False):
    signature = KEY.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    sig_int = int.from_bytes(signature, "big")
    n = KEY.public_key().public_numbers().n
    if tamper:
        msg = msg + b"!"
    digest = hashlib.sha256(msg).digest()
    advice = stack_advice([rsa_advice(sig_int, n)])
    inputs = {
        "sig": jnp.asarray(limbs17(sig_int)),
        "mod": jnp.asarray(limbs17(n)),
        "digest_bits": jnp.asarray(digest_bits_input(digest)),
        **{k: jnp.asarray(v) for k, v in advice.items()},
    }
    w = cc.eval_witness(inputs, 1)
    vals = [int(v) for v in LB.limbs_to_ints(np.asarray(w[:, :, 0]))]
    return cc.check_satisfied_host(vals)


def test_rsa_verifier():
    cc = build()
    assert cc.n_constraints > 50000  # sanity: nontrivial circuit
    assert run_case(cc, b"hello zkemail on tpu")
    assert not run_case(cc, b"hello zkemail on tpu", tamper=True)
