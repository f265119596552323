"""ctypes bindings + build glue for the native Groth16 verifier.

Builds zkemail_tpu/native/groth16_verifier.cpp with g++ on first use (no
pybind11 in this environment — plain C ABI + ctypes), and exposes
`verify(vk, proof, publics)` over the same containers as the Python oracle.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

from ..core.curve import G1, G2
from ..prover.containers import Proof, VerifyingKey

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libgroth16.so"
_SRC = _DIR / "groth16_verifier.cpp"

_lib = None


def build(force: bool = False) -> Path:
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _get_lib():
    global _lib
    if _lib is None:
        build()
        _lib = ctypes.CDLL(str(_SO))
        _lib.groth16_verify.restype = ctypes.c_int
        _lib.groth16_verify.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int,
        ]
    return _lib


def _g1_bytes(p: G1) -> bytes:
    if p.inf:
        return b"\x00" * 64
    return p.x.to_bytes(32, "little") + p.y.to_bytes(32, "little")


def _g2_bytes(p: G2) -> bytes:
    if p.inf:
        return b"\x00" * 128
    return (
        p.x.c0.to_bytes(32, "little") + p.x.c1.to_bytes(32, "little")
        + p.y.c0.to_bytes(32, "little") + p.y.c1.to_bytes(32, "little")
    )


def verify(vk: VerifyingKey, proof: Proof, publics: list[int]) -> bool:
    """Native-path Groth16 verification (same semantics as containers.verify)."""
    lib = _get_lib()
    vk_blob = (
        _g1_bytes(vk.alpha_g1) + _g2_bytes(vk.beta_g2) + _g2_bytes(vk.gamma_g2)
        + _g2_bytes(vk.delta_g2) + b"".join(_g1_bytes(p) for p in vk.ic)
    )
    proof_blob = _g1_bytes(proof.a) + _g2_bytes(proof.b) + _g1_bytes(proof.c)
    pub_blob = b"".join((x % (1 << 256)).to_bytes(32, "little") for x in publics)
    res = lib.groth16_verify(
        vk_blob, len(vk.ic), proof_blob, pub_blob, len(publics)
    )
    if res < 0:
        raise ValueError("native verifier rejected the input layout")
    return bool(res)
