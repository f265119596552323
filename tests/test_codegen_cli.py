"""Verifier codegen CLI: snarkjs artifacts -> standalone C++ verifier
(parity with packages/rust-verifier/src/main.rs, oracle = the reference's
bundled proof-of-twitter artifact)."""

import json
import shutil
import subprocess
from pathlib import Path

import pytest

from zkemail_tpu.native.codegen import generate_verifier, generate_verifier_arguments
from zkemail_tpu.prover.containers import Proof, VerifyingKey
from zkemail_tpu.utils.ark_serialize import (
    decode_g1,
    decode_g2,
    decode_vkey,
    encode_g1,
    encode_g2,
    encode_proof,
    encode_vkey,
)

REF = Path("/root/reference/packages/rust-verifier/tests/data/proof_of_twitter")


def test_ark_encode_decode_roundtrip():
    vk = VerifyingKey.from_snarkjs(json.loads((REF / "vkey.json").read_text()))
    blob = encode_vkey(vk)
    back = decode_vkey(blob)
    assert back["alpha_g1"].x == vk.alpha_g1.x and back["alpha_g1"].y == vk.alpha_g1.y
    assert back["beta_g2"].x == vk.beta_g2.x
    assert len(back["ic"]) == len(vk.ic)
    for p, q in zip(back["ic"], vk.ic):
        assert p.x == q.x and p.y == q.y
    proof = Proof.from_snarkjs(json.loads((REF / "proof.json").read_text()))
    pb = encode_proof(proof)
    assert len(pb) == 128
    assert decode_g1(pb[:32]).x == proof.a.x
    b2 = decode_g2(pb[32:96])
    assert b2.x == proof.b.x and b2.y == proof.b.y


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_generated_verifier_end_to_end(tmp_path):
    out_cpp = tmp_path / "verifier.cpp"
    generate_verifier(str(REF / "vkey.json"), str(out_cpp))
    generate_verifier_arguments(
        str(REF / "proof.json"), str(REF / "public.json"), out_dir=str(tmp_path)
    )
    exe = tmp_path / "verifier"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", str(out_cpp), "-o", str(exe)],
        check=True, capture_output=True,
    )
    ok = subprocess.run(
        [str(exe), str(tmp_path / "proof.flat.bin"), str(tmp_path / "publics.flat.bin")],
        capture_output=True, text=True,
    )
    assert ok.returncode == 0 and "OK" in ok.stdout
    # negative: tamper one byte of the first public input
    bad = bytearray((tmp_path / "publics.flat.bin").read_bytes())
    bad[0] ^= 1
    (tmp_path / "publics.bad.bin").write_bytes(bytes(bad))
    rej = subprocess.run(
        [str(exe), str(tmp_path / "proof.flat.bin"), str(tmp_path / "publics.bad.bin")],
        capture_output=True, text=True,
    )
    assert rej.returncode == 1 and "INVALID" in rej.stdout
