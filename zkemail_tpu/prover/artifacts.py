"""Chunked proving-key artifact store.

The reference ships its zkey as gzipped chunks with suffixes ``b``..``k``,
downloads them in parallel, and caches the uncompressed blobs client-side so
snarkjs finds them (packages/helpers/src/chunked-zkey.ts:9-74).  The TPU
framework's equivalent: a ProvingKey is exported as N gzipped chunks with the
same suffix convention plus a JSON manifest carrying shapes and SHA-256
integrity hashes; loading verifies every chunk, reassembles the CRS tables,
and (optionally) places them on device.

Layout per chunk file ``<name>.pkchunk<suffix>.gz``: a raw slice of the
concatenated little-endian int32 stream of all query tables.  The manifest
``<name>.manifest.json`` stores the table schema (field order, shapes,
dtypes), scalar/host-point fields, and per-chunk digests.
"""

from __future__ import annotations

import gzip
import hashlib
import json
from pathlib import Path

import numpy as np

from ..core.curve import G1, G2
from ..core.towers import Fq2
from .containers import VerifyingKey
from .setup import ProvingKey

# same suffix alphabet as chunked-zkey.ts:9 ("b" .. "k" = up to 10 chunks)
_SUFFIXES = "bcdefghijk"

# Manifest format version. Bumped with the CircomReduction H-basis switch
# (mirroring the pickle cache's pk3_ prefix bump): older manifests carry an
# h_query in the tau^i*Z/delta basis and no n_constraints, which would prove
# *invalid* proofs with no error if loaded. Bump whenever ProvingKey
# semantics change.
_FORMAT_VERSION = 3

_QUERIES = ("a_query", "b1_query", "b2_query", "c_query", "h_query")


def _g1_json(p: G1) -> list:
    return [str(p.x), str(p.y), int(p.inf)]


def _g1_from(obj) -> G1:
    return G1.identity() if obj[2] else G1(int(obj[0]), int(obj[1]))


def _g2_json(p: G2) -> list:
    if p.inf:
        return [["0", "0"], ["0", "0"], 1]
    return [[str(p.x.c0), str(p.x.c1)], [str(p.y.c0), str(p.y.c1)], 0]


def _g2_from(obj) -> G2:
    if obj[2]:
        return G2.identity()
    return G2(Fq2(int(obj[0][0]), int(obj[0][1])), Fq2(int(obj[1][0]), int(obj[1][1])))


def _flatten_tables(pk: ProvingKey):
    """-> (schema, concatenated int32 stream). Schema rebuilds the pytrees."""
    schema = []
    parts = []
    for qname in _QUERIES:
        q = getattr(pk, qname)
        for coord in sorted(q.keys()):
            v = q[coord]
            if isinstance(v, tuple):
                for ci, c in enumerate(v):
                    arr = np.asarray(c, dtype=np.int32)
                    schema.append([qname, coord, ci, list(arr.shape)])
                    parts.append(arr.reshape(-1))
            else:
                arr = np.asarray(v, dtype=np.int32)
                schema.append([qname, coord, -1, list(arr.shape)])
                parts.append(arr.reshape(-1))
    stream = np.concatenate(parts) if parts else np.zeros(0, np.int32)
    return schema, stream


def export_chunked(pk: ProvingKey, out_dir: str, name: str = "emailverifier",
                   n_chunks: int = 10) -> dict:
    """Write <name>.pkchunk{b..}.gz + <name>.manifest.json; returns manifest."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    schema, stream = _flatten_tables(pk)
    raw = stream.tobytes()
    n_chunks = max(1, min(n_chunks, len(_SUFFIXES)))
    chunk_len = -(-len(raw) // n_chunks)
    chunks = []
    for i in range(n_chunks):
        blob = raw[i * chunk_len : (i + 1) * chunk_len]
        suffix = _SUFFIXES[i]
        fname = f"{name}.pkchunk{suffix}.gz"
        with gzip.open(out / fname, "wb", compresslevel=1) as f:
            f.write(blob)
        chunks.append({
            "file": fname,
            "bytes": len(blob),
            "sha256": hashlib.sha256(blob).hexdigest(),
        })
    manifest = {
        "format_version": _FORMAT_VERSION,
        "name": name,
        "domain_log2": pk.domain_log2,
        "n_public": pk.n_public,
        "n_constraints": pk.n_constraints,
        "schema": schema,
        "chunks": chunks,
        "host_points": {
            "alpha_g1": _g1_json(pk.alpha_g1),
            "beta_g1": _g1_json(pk.beta_g1),
            "beta_g2": _g2_json(pk.beta_g2),
            "delta_g1": _g1_json(pk.delta_g1),
            "delta_g2": _g2_json(pk.delta_g2),
        },
        "vk": {
            "alpha_g1": _g1_json(pk.vk.alpha_g1),
            "beta_g2": _g2_json(pk.vk.beta_g2),
            "gamma_g2": _g2_json(pk.vk.gamma_g2),
            "delta_g2": _g2_json(pk.vk.delta_g2),
            "ic": [_g1_json(p) for p in pk.vk.ic],
        },
    }
    (out / f"{name}.manifest.json").write_text(json.dumps(manifest))
    return manifest


def load_chunked(out_dir: str, name: str = "emailverifier",
                 to_device: bool = False) -> ProvingKey:
    """Load + integrity-check chunks, rebuild the ProvingKey."""
    out = Path(out_dir)
    manifest = json.loads((out / f"{name}.manifest.json").read_text())
    ver = manifest.get("format_version")
    if ver != _FORMAT_VERSION or "n_constraints" not in manifest:
        # refuse stale pre-H-basis exports: n_constraints defaulting to 0
        # would let compute_h's instance-row SET overwrite A·w rows, and an
        # old-basis h_query silently yields invalid proofs
        raise ValueError(
            f"chunked artifact '{name}' has format_version={ver!r} "
            f"(need {_FORMAT_VERSION} with n_constraints); re-export with "
            "export_chunked"
        )
    raw = bytearray()
    for ch in manifest["chunks"]:
        with gzip.open(out / ch["file"], "rb") as f:
            blob = f.read()
        if hashlib.sha256(blob).hexdigest() != ch["sha256"]:
            raise ValueError(f"integrity check failed for {ch['file']}")
        if len(blob) != ch["bytes"]:
            raise ValueError(f"size mismatch for {ch['file']}")
        raw.extend(blob)
    stream = np.frombuffer(bytes(raw), dtype=np.int32)
    queries = {q: {} for q in _QUERIES}
    off = 0
    for qname, coord, ci, shape in manifest["schema"]:
        size = int(np.prod(shape))
        arr = stream[off : off + size].reshape(shape)
        off += size
        if to_device:
            import jax.numpy as jnp

            arr = jnp.asarray(arr)
        if ci == -1:
            queries[qname][coord] = arr
        else:
            queries[qname].setdefault(coord, [None, None])
            queries[qname][coord][ci] = arr
    if off != len(stream):
        raise ValueError("trailing data in chunk stream")
    for q in queries.values():
        for k, v in list(q.items()):
            if isinstance(v, list):
                q[k] = tuple(v)
    hp = manifest["host_points"]
    vk = manifest["vk"]
    return ProvingKey(
        domain_log2=manifest["domain_log2"],
        n_public=manifest["n_public"],
        n_constraints=manifest["n_constraints"],
        alpha_g1=_g1_from(hp["alpha_g1"]),
        beta_g1=_g1_from(hp["beta_g1"]),
        beta_g2=_g2_from(hp["beta_g2"]),
        delta_g1=_g1_from(hp["delta_g1"]),
        delta_g2=_g2_from(hp["delta_g2"]),
        a_query=queries["a_query"],
        b1_query=queries["b1_query"],
        b2_query=queries["b2_query"],
        c_query=queries["c_query"],
        h_query=queries["h_query"],
        vk=VerifyingKey(
            alpha_g1=_g1_from(vk["alpha_g1"]),
            beta_g2=_g2_from(vk["beta_g2"]),
            gamma_g2=_g2_from(vk["gamma_g2"]),
            delta_g2=_g2_from(vk["delta_g2"]),
            ic=[_g1_from(p) for p in vk["ic"]],
        ),
    )


def download_chunked(base_url: str, cache_dir: str, name: str = "emailverifier",
                     retries: int = 3, fetch=None, progress=None) -> "ProvingKey":
    """Fetch manifest + chunks into cache_dir (with per-chunk retries), then
    load_chunked.

    Parity: chunked-zkey.ts downloadFromFilename/downloadProofFiles — each
    compressed chunk is fetched with up to `retries` attempts (:24-33),
    integrity-checked, and cached so later calls skip the network (:35-56,
    localforage role played by the on-disk cache_dir).  `fetch(url) -> bytes`
    is injectable for tests / custom transports; default urllib.
    """
    import urllib.request

    def default_fetch(url: str) -> bytes:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.read()

    fetch = fetch or default_fetch
    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)

    def fetch_with_retry(fname: str) -> bytes:
        last = None
        for attempt in range(retries):
            try:
                data = fetch(f"{base_url.rstrip('/')}/{fname}")
                if progress:
                    progress(f"downloaded {fname} ({len(data)} bytes)")
                return data
            except Exception as exc:  # noqa: BLE001 — retry any transport error
                last = exc
                if progress:
                    progress(f"attempt {attempt + 1}/{retries} failed for {fname}: {exc}")
        raise RuntimeError(f"failed to fetch {fname} after {retries} attempts") from last

    man_name = f"{name}.manifest.json"
    man_path = cache / man_name
    if not man_path.exists():
        man_path.write_bytes(fetch_with_retry(man_name))
    manifest = json.loads(man_path.read_text())
    for ch in manifest["chunks"]:
        path = cache / ch["file"]
        if path.exists():
            with gzip.open(path, "rb") as f:
                if hashlib.sha256(f.read()).hexdigest() == ch["sha256"]:
                    continue  # cached + intact
        path.write_bytes(fetch_with_retry(ch["file"]))
    return load_chunked(str(cache), name)
