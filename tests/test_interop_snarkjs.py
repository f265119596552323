"""Artifact interop: TPU-produced proofs/vkeys <-> snarkjs JSON <-> native C++.

The reference toolchain consumes snarkjs-format artifacts
(packages/rust-verifier/src/verifier_utils.rs:65-153 parses proof.json /
vkey.json / public.json). These tests prove the round trip in the direction
round 1 lacked: OUR prover's output, exported as snarkjs JSON, re-ingested
and verified by (a) the JSON parsers, (b) the native C++ verifier, and
(c) a codegen'd standalone verifier binary with the vkey embedded.
"""

import ctypes
import json
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.core import limbs as LB
from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.prover.containers import (
    Proof,
    VerifyingKey,
    publics_to_snarkjs,
    verify,
)
from zkemail_tpu.prover.groth16 import prove
from zkemail_tpu.prover.setup import groth16_setup


@pytest.fixture(scope="module")
def proven_toy():
    cs = ConstraintSystem("interop_toy")
    x = cs.add_input("x", ())
    x2 = cs.mul(x, x)
    y = cs.define(x2 + 7 * x.lc() + 1)
    cs.mark_public(y)
    cc = cs.compile()
    pk = groth16_setup(cc, seed=11)
    w = cc.eval_witness({"x": jnp.asarray([5], dtype=jnp.int32)}, 1)
    proof, publics = prove(pk, cc, w[:, :, 0])
    assert verify(pk.vk, proof, publics)
    return pk, proof, publics


def test_snarkjs_json_roundtrip(proven_toy, tmp_path):
    pk, proof, publics = proven_toy
    (tmp_path / "proof.json").write_text(json.dumps(proof.to_snarkjs()))
    (tmp_path / "vkey.json").write_text(json.dumps(pk.vk.to_snarkjs()))
    (tmp_path / "public.json").write_text(json.dumps(publics_to_snarkjs(publics)))

    proof2 = Proof.from_snarkjs(json.loads((tmp_path / "proof.json").read_text()))
    vk2 = VerifyingKey.from_snarkjs(json.loads((tmp_path / "vkey.json").read_text()))
    pubs2 = [int(s) for s in json.loads((tmp_path / "public.json").read_text())]
    assert pubs2 == publics
    assert vk2.to_snarkjs() == pk.vk.to_snarkjs()
    assert verify(vk2, proof2, pubs2)
    # cross: exported vkey structure matches what the reference fixtures use
    ref = json.loads(
        open(
            "/root/reference/packages/rust-verifier/tests/data/proof_of_twitter/vkey.json"
        ).read()
    )
    ours = pk.vk.to_snarkjs()
    for key in ("protocol", "curve", "vk_alpha_1", "vk_beta_2", "IC", "nPublic"):
        assert key in ref and key in ours


def test_native_cpp_verifies_own_proof(proven_toy):
    from zkemail_tpu.native import verifier as NV

    pk, proof, publics = proven_toy
    assert NV.verify(pk.vk, proof, publics)
    assert not NV.verify(pk.vk, proof, [publics[0] + 1])


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_codegen_binary_from_own_snarkjs_json(proven_toy, tmp_path):
    """Full external loop: our proof -> snarkjs JSON on disk -> codegen a
    standalone C++ verifier from the JSON -> compile -> verify binary-level."""
    from zkemail_tpu.native.codegen import (
        generate_verifier,
        generate_verifier_arguments,
    )

    pk, proof, publics = proven_toy
    (tmp_path / "proof.json").write_text(json.dumps(proof.to_snarkjs()))
    (tmp_path / "vkey.json").write_text(json.dumps(pk.vk.to_snarkjs()))
    (tmp_path / "public.json").write_text(json.dumps(publics_to_snarkjs(publics)))

    out_cpp = tmp_path / "verifier.cpp"
    generate_verifier(str(tmp_path / "vkey.json"), str(out_cpp))
    generate_verifier_arguments(
        str(tmp_path / "proof.json"),
        str(tmp_path / "public.json"),
        out_dir=str(tmp_path),
    )
    exe = tmp_path / "verifier"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", str(out_cpp), "-o", str(exe)],
        check=True,
        capture_output=True,
    )
    ok = subprocess.run(
        [str(exe), str(tmp_path / "proof.flat.bin"), str(tmp_path / "publics.flat.bin")],
        capture_output=True,
        text=True,
    )
    assert ok.returncode == 0 and "OK" in ok.stdout
    bad = bytearray((tmp_path / "publics.flat.bin").read_bytes())
    bad[0] ^= 1
    (tmp_path / "publics.bad.bin").write_bytes(bytes(bad))
    rej = subprocess.run(
        [str(exe), str(tmp_path / "proof.flat.bin"), str(tmp_path / "publics.bad.bin")],
        capture_output=True,
        text=True,
    )
    assert rej.returncode == 1 and "INVALID" in rej.stdout
