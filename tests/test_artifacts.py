"""Chunked proving-key artifact store: export/load round-trip, integrity
checks, and proving with a reloaded key (the chunked-zkey.ts caching analog,
packages/helpers/src/chunked-zkey.ts:9-74)."""

import gzip

import jax.numpy as jnp
import numpy as np
import pytest

from zkemail_tpu.circuits.builder import ConstraintSystem
from zkemail_tpu.core import limbs as LB
from zkemail_tpu.prover.artifacts import export_chunked, load_chunked
from zkemail_tpu.prover.containers import verify
from zkemail_tpu.prover.groth16 import prove
from zkemail_tpu.prover.setup import groth16_setup


def _toy_cc():
    cs = ConstraintSystem("toy_art")
    x = cs.add_input("x", ())
    x2 = cs.mul(x, x)
    y = cs.define(x2 + x + 1)
    cs.mark_public(y)
    return cs.compile()


def test_export_load_roundtrip_and_prove(tmp_path):
    cc = _toy_cc()
    pk = groth16_setup(cc, seed=5)
    manifest = export_chunked(pk, str(tmp_path), name="toy", n_chunks=4)
    assert len(manifest["chunks"]) == 4
    assert [c["file"][-4:-3] for c in manifest["chunks"]] == ["b", "c", "d", "e"]

    pk2 = load_chunked(str(tmp_path), name="toy")
    for q in ("a_query", "b1_query", "b2_query", "c_query", "h_query"):
        t1, t2 = getattr(pk, q), getattr(pk2, q)
        assert set(t1.keys()) == set(t2.keys())
        for k in t1:
            v1, v2 = t1[k], t2[k]
            if isinstance(v1, tuple):
                for c1, c2 in zip(v1, v2):
                    assert (np.asarray(c1) == np.asarray(c2)).all()
            else:
                assert (np.asarray(v1) == np.asarray(v2)).all()
    assert pk2.domain_log2 == pk.domain_log2
    assert pk2.vk.ic[0].x == pk.vk.ic[0].x

    # prove with the reloaded key; verify under the original vk
    w = cc.eval_witness({"x": jnp.asarray([4], dtype=jnp.int32)}, 1)
    pk2_dev = load_chunked(str(tmp_path), name="toy", to_device=True)
    proof, publics = prove(pk2_dev, cc, w[:, :, 0])
    assert publics == [4 * 4 + 4 + 1]
    assert verify(pk.vk, proof, publics)


def test_corrupt_chunk_rejected(tmp_path):
    cc = _toy_cc()
    pk = groth16_setup(cc, seed=5)
    manifest = export_chunked(pk, str(tmp_path), name="toy", n_chunks=2)
    f = tmp_path / manifest["chunks"][1]["file"]
    blob = bytearray(gzip.decompress(f.read_bytes()))
    blob[7] ^= 0xFF
    f.write_bytes(gzip.compress(bytes(blob)))
    with pytest.raises(ValueError, match="integrity"):
        load_chunked(str(tmp_path), name="toy")


def test_download_chunked_retries_and_cache(tmp_path):
    """chunked-zkey.ts:24-56 parity: per-chunk retry on transient failures,
    integrity-checked on-disk cache skipping refetches."""
    import pathlib

    from zkemail_tpu.circuits.builder import ConstraintSystem
    from zkemail_tpu.prover.artifacts import download_chunked, export_chunked
    from zkemail_tpu.prover.setup import groth16_setup

    cs = ConstraintSystem("dl")
    x = cs.add_input("x", ())
    y = cs.define(cs.mul(x, x) + 1)
    cs.mark_public(y)
    cc = cs.compile()
    pk = groth16_setup(cc, seed=3)
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    export_chunked(pk, str(src), name="dl", n_chunks=3)

    calls = {}

    def flaky(url):
        fname = url.rsplit("/", 1)[1]
        calls[fname] = calls.get(fname, 0) + 1
        if calls[fname] == 1 and fname.endswith("chunkc.gz"):
            raise IOError("transient")
        return (pathlib.Path(src) / fname).read_bytes()

    pk2 = download_chunked("http://example/zk", str(dst), name="dl", fetch=flaky)
    assert pk2.n_public == pk.n_public and pk2.vk.ic == pk.vk.ic
    assert calls["dl.pkchunkc.gz"] == 2  # one transient failure, one retry

    calls.clear()
    download_chunked("http://example/zk", str(dst), name="dl", fetch=flaky)
    assert not any(k.endswith(".gz") for k in calls)  # cache hit
