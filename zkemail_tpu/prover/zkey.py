"""snarkjs `.zkey` container read/write.

Parity target: the reference proves under snarkjs-generated zkeys
(packages/helpers/src/chunked-zkey.ts:76-91 feeds them to
snarkjs.groth16.fullProve; the zkey binary layout is snarkjs'
src/zkey_utils.js "bin file" format). This module maps that container
to/from this framework's ProvingKey so a user can bring a reference zkey —
or ship one of ours to a snarkjs consumer.

Layout (bin file): magic b"zkey", u32 version=1, u32 nSections, then
sections of (u32 type, u64 size, payload):
  1 prover type (u32 1 = groth16)
  2 groth16 header: n8q, q, n8r, r, nVars, nPublic, domainSize,
    alpha_g1, beta_g1, beta_g2, gamma_g2, delta_g1, delta_g2
  3 IC           (nPublic+1 G1)
  4 A/B coeffs   (u32 nCoeffs; each u32 matrix(0=A,1=B), u32 row, u32 col,
                  n8r-byte Montgomery value) — C is never stored: for a
                  satisfied witness C·w == (A·w)∘(B·w) pointwise
  5 pointsA      (nVars G1)       6 pointsB1 (nVars G1)
  7 pointsB2     (nVars G2)       8 pointsC  (nVars-nPublic-1 G1)
  9 pointsH      (domainSize G1)  10 contributions (ignored on read)

Field elements are little-endian Montgomery form with R = 2^256. G1 points
are (x, y) affine pairs, G2 points ((x0, x1), (y0, y1)); the zero point is
all-zero coordinates.

H basis: pointsH are in the snarkjs / CircomReduction shifted-domain basis
— H_i = [L_{2i+1}^{(2m)}(tau)/delta], the odd-indexed Lagrange polynomials
over the double domain (the basis ark-circom's CircomReduction pairs with,
packages/rust-verifier/src/verifier_utils.rs:20-23). This framework's own
setup and prover use the SAME basis natively (prover/setup.py,
prover/groth16.compute_h), so zkeys round-trip in both directions with no
basis conversion: an imported snarkjs zkey proves here, and a zkey written
here carries the section-9 contents a snarkjs consumer expects.

Coefficient section: written as the pure R1CS (no virtual instance rows);
on read, trailing instance rows (matrix A, row nC+s, col s, value 1) are
detected and folded into the inferred n_constraints — the prover's
compute_h places instance values with a SET so both conventions evaluate
identically.
"""

from __future__ import annotations

import struct

import numpy as np

from ..core import field as F
from ..core.curve import G1, G2
from ..core.towers import Fq2
from .containers import VerifyingKey
from .setup import ProvingKey

Q = F.FQ.p
R_SCALAR = F.R
MONT = 1 << 256
MONT_INV_Q = pow(MONT, Q - 2, Q)
MONT_INV_R = pow(MONT, R_SCALAR - 2, R_SCALAR)

GROTH16 = 1


def _fq_bytes(v: int) -> bytes:
    return (v * MONT % Q).to_bytes(32, "little")


def _fq_read(b: bytes) -> int:
    return int.from_bytes(b, "little") * MONT_INV_Q % Q


def _fr_bytes(v: int) -> bytes:
    return (v * MONT % R_SCALAR).to_bytes(32, "little")


def _fr_read(b: bytes) -> int:
    return int.from_bytes(b, "little") * MONT_INV_R % R_SCALAR


def _g1_bytes(p: G1) -> bytes:
    if p.inf:
        return bytes(64)
    return _fq_bytes(p.x) + _fq_bytes(p.y)


def _g1_read(b: bytes) -> G1:
    x, y = _fq_read(b[:32]), _fq_read(b[32:64])
    if x == 0 and y == 0:
        return G1.identity()
    return G1(x, y)


def _g2_bytes(p: G2) -> bytes:
    if p.inf:
        return bytes(128)
    return (
        _fq_bytes(p.x.c0) + _fq_bytes(p.x.c1) + _fq_bytes(p.y.c0) + _fq_bytes(p.y.c1)
    )


def _g2_read(b: bytes) -> G2:
    c = [_fq_read(b[i * 32 : (i + 1) * 32]) for i in range(4)]
    if all(v == 0 for v in c):
        return G2.identity()
    return G2(Fq2(c[0], c[1]), Fq2(c[2], c[3]))


def _limbs_to_fq_ints(arr) -> list:
    """Device Fq limb array (Montgomery form) -> list of standard-form ints."""
    from ..core import limbs as LB

    return [F.FQ.from_mont(int(v)) for v in LB.limbs_to_ints(np.asarray(arr))]


def _query_to_host_points(q, kind: str):
    """Device projective point pytree (batch (n,)) -> list of host points."""
    from ..core import curve_jax as CJ

    ops = CJ.FQ_OPS if kind == "g1" else CJ.FQ2_OPS
    aff = CJ.ec_to_affine(ops, q)
    inf = np.asarray(aff["inf"])
    if kind == "g1":
        xs = _limbs_to_fq_ints(aff["x"])
        ys = _limbs_to_fq_ints(aff["y"])
        return [
            G1.identity() if inf[i] else G1(xs[i], ys[i]) for i in range(len(xs))
        ]
    x0 = _limbs_to_fq_ints(aff["x"][0])
    x1 = _limbs_to_fq_ints(aff["x"][1])
    y0 = _limbs_to_fq_ints(aff["y"][0])
    y1 = _limbs_to_fq_ints(aff["y"][1])
    return [
        G2.identity() if inf[i] else G2(Fq2(x0[i], x1[i]), Fq2(y0[i], y1[i]))
        for i in range(len(x0))
    ]


def _section(stype: int, payload: bytes) -> bytes:
    return struct.pack("<IQ", stype, len(payload)) + payload


def write_zkey(pk: ProvingKey, cc=None) -> bytes:
    """Serialize a ProvingKey (+ optional circuit's A/B coeffs) as .zkey bytes."""
    a_pts = _query_to_host_points(pk.a_query, "g1")
    b1_pts = _query_to_host_points(pk.b1_query, "g1")
    b2_pts = _query_to_host_points(pk.b2_query, "g2")
    c_pts = _query_to_host_points(pk.c_query, "g1")
    h_pts = _query_to_host_points(pk.h_query, "g1")
    n_vars = len(a_pts)
    m = 1 << pk.domain_log2

    head = struct.pack("<I", 32) + Q.to_bytes(32, "little")
    head += struct.pack("<I", 32) + R_SCALAR.to_bytes(32, "little")
    head += struct.pack("<III", n_vars, pk.n_public, m)
    head += _g1_bytes(pk.alpha_g1) + _g1_bytes(pk.beta_g1) + _g2_bytes(pk.beta_g2)
    head += _g2_bytes(pk.vk.gamma_g2) + _g1_bytes(pk.delta_g1) + _g2_bytes(pk.delta_g2)

    coeffs = b""
    n_coeffs = 0
    if cc is not None:
        parts = []
        for mat_id, (rows, cols, cfs) in ((0, cc.A), (1, cc.B)):
            for r, c, v in zip(rows, cols, cfs):
                parts.append(
                    struct.pack("<III", mat_id, int(r), int(c)) + _fr_bytes(int(v))
                )
                n_coeffs += 1
        # materialize the virtual instance rows (A row nC+s, col s, value 1)
        # exactly like snarkjs' zkey builder: they pin max(row)+1 to
        # nC + nPublic + 1, making read_zkey's constraint-count inference
        # authoritative even when the trailing real constraints are linear
        # (empty A/B rows would otherwise undercount, and compute_h's
        # instance SET would clobber live rows on re-import)
        n_c = cc.n_constraints
        for s in range(pk.n_public + 1):
            parts.append(struct.pack("<III", 0, n_c + s, s) + _fr_bytes(1))
            n_coeffs += 1
        coeffs = b"".join(parts)
    coeffs = struct.pack("<I", n_coeffs) + coeffs

    sections = [
        _section(1, struct.pack("<I", GROTH16)),
        _section(2, head),
        _section(3, b"".join(_g1_bytes(p) for p in pk.vk.ic)),
        _section(4, coeffs),
        _section(5, b"".join(_g1_bytes(p) for p in a_pts)),
        _section(6, b"".join(_g1_bytes(p) for p in b1_pts)),
        _section(7, b"".join(_g2_bytes(p) for p in b2_pts)),
        _section(8, b"".join(_g1_bytes(p) for p in c_pts)),
        _section(9, b"".join(_g1_bytes(p) for p in h_pts)),
    ]
    return b"zkey" + struct.pack("<II", 1, len(sections)) + b"".join(sections)


def read_zkey(data: bytes) -> tuple[ProvingKey, dict]:
    """Parse .zkey bytes -> (ProvingKey with device query tables, coeffs).

    coeffs: {"A": (rows, cols, vals), "B": ...} from section 4 (Python-int
    values) for cross-checking against the local circuit's R1CS.
    """
    from ..ops.msm import g2_points_from_affine, points_from_affine_ints
    from ..core import curve_jax as CJ

    if data[:4] != b"zkey":
        raise ValueError("not a zkey file (bad magic)")
    _version, n_sections = struct.unpack_from("<II", data, 4)
    off = 12
    sections: dict[int, bytes] = {}
    for _ in range(n_sections):
        stype, size = struct.unpack_from("<IQ", data, off)
        off += 12
        sections[stype] = data[off : off + size]
        off += size

    prover_type = struct.unpack_from("<I", sections[1], 0)[0]
    if prover_type != GROTH16:
        raise ValueError(f"unsupported zkey prover type {prover_type}")

    h = sections[2]
    o = 0
    n8q = struct.unpack_from("<I", h, o)[0]; o += 4
    q = int.from_bytes(h[o : o + n8q], "little"); o += n8q
    n8r = struct.unpack_from("<I", h, o)[0]; o += 4
    r = int.from_bytes(h[o : o + n8r], "little"); o += n8r
    if q != Q or r != R_SCALAR:
        raise ValueError("zkey is not over BN254")
    n_vars, n_public, m = struct.unpack_from("<III", h, o); o += 12
    alpha_g1 = _g1_read(h[o : o + 64]); o += 64
    beta_g1 = _g1_read(h[o : o + 64]); o += 64
    beta_g2 = _g2_read(h[o : o + 128]); o += 128
    gamma_g2 = _g2_read(h[o : o + 128]); o += 128
    delta_g1 = _g1_read(h[o : o + 64]); o += 64
    delta_g2 = _g2_read(h[o : o + 128]); o += 128

    def g1_list(raw: bytes, n: int):
        return [_g1_read(raw[i * 64 : (i + 1) * 64]) for i in range(n)]

    ic = g1_list(sections[3], n_public + 1)
    a_pts = g1_list(sections[5], n_vars)
    b1_pts = g1_list(sections[6], n_vars)
    b2_pts = [_g2_read(sections[7][i * 128 : (i + 1) * 128]) for i in range(n_vars)]
    c_pts = g1_list(sections[8], n_vars - n_public - 1)
    h_pts = g1_list(sections[9], m)  # CircomReduction basis: all m points

    n_coeffs = struct.unpack_from("<I", sections[4], 0)[0]
    coeffs = {"A": ([], [], []), "B": ([], [], [])}
    o = 4
    rec = 12 + n8r
    for _ in range(n_coeffs):
        mat_id, row, col = struct.unpack_from("<III", sections[4], o)
        val = _fr_read(sections[4][o + 12 : o + rec])
        dest = coeffs["A"] if mat_id == 0 else coeffs["B"]
        dest[0].append(row)
        dest[1].append(col)
        dest[2].append(val)
        o += rec

    # Infer the R1CS constraint count. If the coeff section materializes the
    # virtual instance rows (matrix A, row nC+s, col s, value 1; B empty
    # there), fold them out — the prover re-places instance values itself
    # (compute_h SETs rows nC..nC+nPublic, idempotent for both conventions).
    all_rows = coeffs["A"][0] + coeffs["B"][0]
    n_constraints = (max(all_rows) + 1) if all_rows else 0
    cand = n_constraints - (n_public + 1)
    if cand >= 0:
        a_set = set(zip(coeffs["A"][0], coeffs["A"][1], coeffs["A"][2]))
        b_rows = set(coeffs["B"][0])
        is_instance_block = all(
            (cand + s, s, 1) in a_set and (cand + s) not in b_rows
            for s in range(n_public + 1)
        )
        if is_instance_block:
            n_constraints = cand

    def dev_g1(pts):
        return points_from_affine_ints(
            CJ.FQ_OPS,
            [p.x if not p.inf else 0 for p in pts],
            [p.y if not p.inf else 1 for p in pts],
            [p.inf for p in pts],
        )

    def dev_g2(pts):
        return g2_points_from_affine(
            [0 if p.inf else p.x.c0 for p in pts],
            [0 if p.inf else p.x.c1 for p in pts],
            [1 if p.inf else p.y.c0 for p in pts],
            [0 if p.inf else p.y.c1 for p in pts],
            [p.inf for p in pts],
        )

    domain_log2 = (m - 1).bit_length()
    vk = VerifyingKey(
        alpha_g1=alpha_g1, beta_g2=beta_g2, gamma_g2=gamma_g2,
        delta_g2=delta_g2, ic=ic,
    )
    pk = ProvingKey(
        domain_log2=domain_log2,
        n_public=n_public,
        alpha_g1=alpha_g1,
        beta_g1=beta_g1,
        beta_g2=beta_g2,
        delta_g1=delta_g1,
        delta_g2=delta_g2,
        a_query=dev_g1(a_pts),
        b1_query=dev_g1(b1_pts),
        b2_query=dev_g2(b2_pts),
        c_query=dev_g1(c_pts),
        h_query=dev_g1(h_pts),
        vk=vk,
        n_constraints=n_constraints,
    )
    return pk, coeffs


def write_zkey_file(pk: ProvingKey, path: str, cc=None) -> None:
    with open(path, "wb") as f:
        f.write(write_zkey(pk, cc))


def read_zkey_file(path: str) -> tuple[ProvingKey, dict]:
    with open(path, "rb") as f:
        return read_zkey(f.read())
