"""Constraint-system builder: R1CS emission + a vectorized JAX witness plan.

This replaces the reference's circom compiler + WASM witness generator
(docs/zk-email-docs/UsageGuide Steps 3-4) with a TPU-first design:

  * Gadgets emit R1CS rows in bulk as numpy COO batches (build is one-time
    per circuit configuration and cacheable).
  * Every gadget also registers *witness steps*: JAX-traceable functions that
    compute whole signal blocks at once (vectorized over SHA blocks, limbs,
    bytes, and the email batch) instead of circom's per-signal interpreter.
    The full witness plan jits into a single XLA program, batched over emails.
  * Non-deterministic hints (circom's `<--`: long-division q/r, block index,
    carries) enter as extra *inputs* computed by fast host code — exactly the
    prover-advice role they play in the reference (fp.circom:46, sha.circom:111).

Witness values are BN254 Fr elements in the 22x12-bit limb layout of
core.limbs, standard (non-Montgomery) form; shape (L, n_signals, B).
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field as F
from ..core import limbs as LB

L = F.LIMBS
P = F.R  # circuit field = Fr


def _as_index_array(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int64).reshape(-1)


class SignalVec:
    """A (possibly multi-dimensional) array of signal indices."""

    __slots__ = ("idx",)

    def __init__(self, idx: np.ndarray):
        self.idx = np.asarray(idx, dtype=np.int64)

    @property
    def shape(self):
        return self.idx.shape

    @property
    def size(self):
        return self.idx.size

    def __getitem__(self, key) -> "SignalVec":
        return SignalVec(np.asarray(self.idx[key]))

    def reshape(self, *shape) -> "SignalVec":
        return SignalVec(self.idx.reshape(*shape))

    def flat(self) -> "SignalVec":
        return SignalVec(self.idx.reshape(-1))

    def concat(self, other: "SignalVec") -> "SignalVec":
        return SignalVec(np.concatenate([self.idx.reshape(-1), other.idx.reshape(-1)]))

    # --- linear-combination sugar -----------------------------------------
    def lc(self, coeff=1) -> "LC":
        return LC([(self, coeff)])

    def __add__(self, other):
        return self.lc() + other

    def __radd__(self, other):
        return self.lc() + other

    def __sub__(self, other):
        return self.lc() - other

    def __rsub__(self, other):
        return (-1) * self.lc() + other

    def __mul__(self, k):
        if isinstance(k, (int, np.integer, np.ndarray)):
            return self.lc(k)
        raise TypeError("use cs.mul for signal*signal products")

    __rmul__ = __mul__


class LC:
    """Linear combination: list of (SignalVec, coeff) + constant.

    coeff may be a scalar int or a numpy array broadcastable to the signal
    shape. The constant term may likewise be scalar or array.
    """

    __slots__ = ("terms", "const")

    def __init__(self, terms, const=0):
        self.terms = list(terms)
        self.const = const

    @staticmethod
    def of(x) -> "LC":
        if isinstance(x, LC):
            return x
        if isinstance(x, SignalVec):
            return x.lc()
        if isinstance(x, (int, np.integer, np.ndarray)):
            return LC([], x)
        raise TypeError(type(x))

    def __add__(self, other):
        o = LC.of(other)
        return LC(self.terms + o.terms, _addc(self.const, o.const))

    __radd__ = __add__

    def __sub__(self, other):
        o = LC.of(other)
        neg = [(s, _negc(c)) for s, c in o.terms]
        return LC(self.terms + neg, _addc(self.const, _negc(o.const)))

    def __rsub__(self, other):
        o = LC.of(other)
        neg = [(s, _negc(c)) for s, c in self.terms]
        return LC(o.terms + neg, _addc(o.const, _negc(self.const)))

    def __mul__(self, k):
        if isinstance(k, (int, np.integer, np.ndarray)):
            return LC([(s, _mulc(c, k)) for s, c in self.terms], _mulc(self.const, k))
        raise TypeError("use cs.mul for signal*signal products")

    __rmul__ = __mul__

    @property
    def shape(self):
        shp = ()
        for s, c in self.terms:
            shp = np.broadcast_shapes(shp, s.shape, np.shape(c))
        shp = np.broadcast_shapes(shp, np.shape(self.const))
        return shp


def _addc(a, b):
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return (np.asarray(a, dtype=object) + np.asarray(b, dtype=object))
    return a + b


def _negc(a):
    if isinstance(a, np.ndarray):
        return -a.astype(object)
    return -a


def _mulc(a, b):
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return (np.asarray(a, dtype=object) * np.asarray(b, dtype=object))
    return a * b


@dataclass
class WitnessStep:
    """Computes limb values for out_idx signals: fn(env) -> (L, k, B) int32."""

    out_idx: np.ndarray
    fn: object
    name: str = ""


@dataclass
class InputBinding:
    name: str
    signals: SignalVec
    dtype: str  # "u32" (int array input) | "fr" (limb array input)


class Env:
    """Witness-evaluation environment handed to step functions.

    `perm` maps builder-time signal indices to the compiled (publics-first)
    witness layout; all gathers go through it.
    """

    def __init__(self, w: jnp.ndarray, inputs: dict, perm=None):
        self.w = w  # (L, n, B)
        self.inputs = inputs
        self.perm = perm

    def _map(self, idx: np.ndarray) -> np.ndarray:
        return idx if self.perm is None else self.perm[idx]

    def fr(self, sv: SignalVec) -> jnp.ndarray:
        """Gather signals as Fr limbs: (L, *shape, B)."""
        flat = self.w[:, self._map(sv.idx.reshape(-1)), :]
        return flat.reshape((L,) + sv.shape + (self.w.shape[-1],))

    def u32(self, sv: SignalVec) -> jnp.ndarray:
        """Gather signals known to be < 2^31 as int32: (*shape, B)."""
        limbs = self.w[:3, self._map(sv.idx.reshape(-1)), :]
        val = limbs[0] + (limbs[1] << 12) + (limbs[2] << 24)
        return val.reshape(sv.shape + (self.w.shape[-1],)).astype(jnp.int32)


def lift_u32(x: jnp.ndarray) -> jnp.ndarray:
    """int32 (*shape, B) nonneg -> (L, *shape, B) limbs."""
    x = x.astype(jnp.int32)
    parts = [x & 0xFFF, (x >> 12) & 0xFFF, (x >> 24) & 0x7F]
    z = jnp.zeros_like(x)
    return jnp.stack(parts + [z] * (L - 3), axis=0)


class ConstraintSystem:
    """Accumulates signals, R1CS rows, and the witness plan."""

    def __init__(self, name: str = "circuit"):
        self.name = name
        self.n_signals = 1  # signal 0 is the constant ONE
        self.n_constraints = 0
        # COO triples per matrix: lists of (rows np.int64, cols np.int64, coeffs object)
        self._mats = {"A": [], "B": [], "C": []}
        self.steps: list[WitnessStep] = []
        self.input_bindings: list[InputBinding] = []
        self.public: list[int] = []
        self.one = SignalVec(np.zeros((), dtype=np.int64))
        # constraint/signal spans per named scope — the `snarkjs r1cs info`
        # role (reference records counts by hand, email-verifier.circom:66,86)
        self.scopes: list[tuple[str, int, int, int, int]] = []
        self._scope_stack: list[str] = []

    @contextmanager
    def scope(self, name: str):
        """Label constraints/signals emitted inside with a nested scope path."""
        self._scope_stack.append(name)
        path = "/".join(self._scope_stack)
        c0, s0 = self.n_constraints, self.n_signals
        try:
            yield
        finally:
            self.scopes.append((path, c0, self.n_constraints, s0, self.n_signals))
            self._scope_stack.pop()

    # ---------------------------------------------------------------- alloc
    def alloc(self, shape=(), name: str = "") -> SignalVec:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        idx = np.arange(self.n_signals, self.n_signals + n, dtype=np.int64).reshape(shape)
        self.n_signals += n
        return SignalVec(idx)

    def add_input(self, name: str, shape=(), dtype: str = "u32") -> SignalVec:
        sv = self.alloc(shape, name)
        self.input_bindings.append(InputBinding(name, sv, dtype))

        if dtype == "u32":
            def step(env, name=name, shape=shape):
                x = env.inputs[name]
                return lift_u32(x).reshape((L, sv.size, -1))
        else:
            def step(env, name=name):
                x = env.inputs[name]  # (L, *shape, B) limbs already
                return x.reshape((L, sv.size, -1))

        self.steps.append(WitnessStep(sv.idx.reshape(-1), step, f"input:{name}"))
        return sv

    def mark_public(self, sv: SignalVec):
        self.public.extend(int(i) for i in sv.idx.reshape(-1))

    # ----------------------------------------------------------- constraints
    def _emit(self, mat: str, rows: np.ndarray, lc: LC, shape):
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        store = self._mats[mat]
        for sv, coeff in lc.terms:
            cols = np.broadcast_to(sv.idx, shape).reshape(-1)
            cf = np.broadcast_to(np.asarray(coeff, dtype=object), shape).reshape(-1)
            store.append((rows, cols, cf))
        const = lc.const
        if isinstance(const, np.ndarray) or const != 0:
            cols = np.zeros(n, dtype=np.int64)
            cf = np.broadcast_to(np.asarray(const, dtype=object), shape).reshape(-1)
            store.append((rows, cols, cf))

    def enforce(self, a, b, c):
        """Add constraints  a * b = c  (elementwise over broadcast shape)."""
        a, b, c = LC.of(a), LC.of(b), LC.of(c)
        shape = np.broadcast_shapes(a.shape, b.shape, c.shape)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        rows = np.arange(self.n_constraints, self.n_constraints + n, dtype=np.int64)
        self.n_constraints += n
        self._emit("A", rows, a, shape)
        self._emit("B", rows, b, shape)
        self._emit("C", rows, c, shape)

    def enforce_zero(self, lc):
        self.enforce(lc, LC([], 1), LC([], 0))

    def enforce_equal(self, a, b):
        self.enforce(LC.of(a) - LC.of(b), LC([], 1), LC([], 0))

    def enforce_bit(self, sv):
        self.enforce(sv, LC.of(sv) - 1, LC([], 0))

    # ------------------------------------------------------- witness helpers
    def set_witness(self, sv: SignalVec, fn, name: str = ""):
        """fn(env) -> (L, k, B) limb values for sv.flat()."""
        self.steps.append(WitnessStep(sv.idx.reshape(-1), fn, name))

    def define(self, lc, name: str = "") -> SignalVec:
        """z = lc with a generic witness evaluation (use for small gadgets)."""
        lc = LC.of(lc)
        shape = lc.shape
        z = self.alloc(shape, name)
        self.enforce_equal(lc, z)
        prep = PreparedLC(lc, shape)

        def step(env, prep=prep):
            return prep.eval_std(env)

        self.set_witness(z, step, name or "define")
        return z

    def mul(self, a, b, name: str = "") -> SignalVec:
        """z = a * b (signal product) with generic witness computation."""
        a, b = LC.of(a), LC.of(b)
        shape = np.broadcast_shapes(a.shape, b.shape)
        z = self.alloc(shape, name)
        self.enforce(a, b, z)
        prep_a = PreparedLC(a, shape)
        prep_b = PreparedLC(b, shape)

        def step(env, prep_a=prep_a, prep_b=prep_b):
            a_s = prep_a.eval_small(env)
            b_s = prep_b.eval_small(env) if a_s is not None else None
            if b_s is not None:
                # int64 product path: both factors < 2^31 -> product < 2^62
                # fits int64 and is already reduced (< P)
                if (
                    a_s.max(initial=0) < (1 << 31)
                    and b_s.max(initial=0) < (1 << 31)
                ):
                    return _limbs_from_i64(a_s * b_s)
                prod = (a_s.astype(object) * b_s.astype(object)) % P
                return LB.ints_to_limbs(prod)
            if prep_a.host_eligible(env):
                prod = (prep_a.eval_ints(env) * prep_b.eval_ints(env)) % P
                return LB.ints_to_limbs(prod)
            prod = LB.mont_mul(LB.FR_SPEC, prep_a.eval_mont(env), prep_b.eval_mont(env))
            return _from_mont_dev(prod)

        self.set_witness(z, step, name or "mul")
        return z

    # ------------------------------------------------------------- compile
    def compile(self) -> "CompiledCircuit":
        return CompiledCircuit(self)


def _coeff_limbs_mont(cf_arr) -> np.ndarray:
    vals = [F.FR.to_mont(int(c) % P) for c in cf_arr]
    return LB.ints_to_limbs(np.array(vals, dtype=object))[:, :, None]


def _coeff_limbs_plain(cf_arr) -> np.ndarray:
    vals = [int(c) % P for c in cf_arr]
    return LB.ints_to_limbs(np.array(vals, dtype=object))[:, :, None]


def _to_mont_dev(x: jnp.ndarray) -> jnp.ndarray:
    return LB.to_mont(LB.FR_SPEC, x)


def _from_mont_dev(x: jnp.ndarray) -> jnp.ndarray:
    return LB.from_mont(LB.FR_SPEC, x)


def _limbs_from_i64(vals: np.ndarray) -> np.ndarray:
    """(..., B) non-negative int64 (< 2^62) -> (L, ..., B) int32 limbs."""
    out = np.zeros((L,) + vals.shape, dtype=np.int32)
    mask = (1 << F.LIMB_BITS) - 1
    for i in range(-(-62 // F.LIMB_BITS)):
        out[i] = (vals >> (i * F.LIMB_BITS)) & mask
    return out


class PreparedLC:
    """An LC with coefficient limb arrays precomputed at build time.

    Evaluating an LC inside a witness step must not re-run the Python-int ->
    limb conversion per call (it dominated eager witness time); this caches
    the Montgomery coefficient arrays once — plus an int64 "small" form of
    every coefficient when they all fit, enabling eval_small's pure-numpy
    fast path (the object-int path cost ~3.4 s/batch on the DFA products
    alone at full640)."""

    __slots__ = (
        "terms", "const_limbs", "shape", "n", "int_terms", "int_const",
        "small_cf", "small_const", "small_ok",
    )

    # |coefficient| bound for the int64 path; values are bounded by 3 limbs
    # (36 bits), so sum_t |c_t| * 2^36 + |const| stays < 2^62 for any
    # realistic term count
    SMALL_COEFF = 1 << 20

    def __init__(self, lc: "LC", shape=None):
        lc = LC.of(lc)
        self.shape = tuple(lc.shape if shape is None else shape)
        self.n = int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1
        self.terms = []
        self.int_terms = []
        self.small_cf = []
        bound = 0
        small_ok = True

        def small_of(cf_arr):
            out = np.zeros(len(cf_arr), dtype=np.int64)
            for i, c in enumerate(cf_arr):
                c = int(c) % P
                if c < PreparedLC.SMALL_COEFF:
                    out[i] = c
                elif c > P - PreparedLC.SMALL_COEFF:
                    out[i] = c - P
                else:
                    return None
            return out

        for sv, coeff in lc.terms:
            cf_arr = np.broadcast_to(
                np.asarray(coeff, dtype=object), self.shape
            ).reshape(-1)
            if all(int(c) == 1 for c in cf_arr):
                self.terms.append((sv, None))
                self.int_terms.append(None)
                self.small_cf.append(None)  # unit coefficient
                bound += 1 << 36
            else:
                self.terms.append((sv, jnp.asarray(_coeff_limbs_mont(cf_arr))))
                self.int_terms.append(cf_arr)
                sm = small_of(cf_arr)
                self.small_cf.append(sm)
                if sm is None:
                    small_ok = False
                else:
                    bound += int(np.abs(sm).max(initial=1)) << 36
        cf_arr = np.broadcast_to(np.asarray(lc.const, dtype=object), self.shape).reshape(-1)
        if any(int(x) != 0 for x in cf_arr):
            self.const_limbs = jnp.asarray(_coeff_limbs_plain(cf_arr))
            self.int_const = cf_arr
            self.small_const = small_of(cf_arr)
            if self.small_const is None:
                small_ok = False
            else:
                bound += int(np.abs(self.small_const).max(initial=0))
        else:
            self.const_limbs = None
            self.int_const = None
            self.small_const = None
        self.small_ok = small_ok and bound < (1 << 62)

    # Eager host-int path: for small LCs the jnp evaluation costs dozens of
    # tiny-kernel dispatches; Python bigints win below this size.
    HOST_EVAL_MAX = 8192

    def host_eligible(self, env: "Env") -> bool:
        return (
            isinstance(env.w, np.ndarray)
            and self.n * env.w.shape[-1] <= PreparedLC.HOST_EVAL_MAX
        )

    def eval_small(self, env: "Env"):
        """int64 numpy fast path: (n, B) non-negative int64 standard-form
        values, or None when a coefficient, an operand (> 36 bits), or a
        negative accumulation forces the exact object-int path. The bound
        precomputed in __init__ guarantees no int64 overflow."""
        if not self.small_ok or not isinstance(env.w, np.ndarray):
            return None
        bsz = env.w.shape[-1]
        acc = np.zeros((self.n, bsz), dtype=np.int64)
        for (sv, _), cf in zip(self.terms, self.small_cf):
            g = env.w[:, env._map(sv.idx.reshape(-1)), :]
            if g[3:].any():  # value exceeds 3 limbs (36 bits)
                return None
            vals = (
                g[0].astype(np.int64)
                | (g[1].astype(np.int64) << F.LIMB_BITS)
                | (g[2].astype(np.int64) << (2 * F.LIMB_BITS))
            )
            pad = len(self.shape) - len(sv.shape)
            vals = np.broadcast_to(
                vals.reshape((1,) * pad + sv.shape + (bsz,)),
                tuple(self.shape) + (bsz,),
            ).reshape(self.n, bsz)
            if cf is None:
                acc = acc + vals
            else:
                acc = acc + cf.reshape(self.n, 1) * vals
        if self.small_const is not None:
            acc = acc + self.small_const.reshape(self.n, 1)
        if (acc < 0).any():  # would need a bigint mod — exact path instead
            return None
        return acc

    def eval_ints(self, env: "Env") -> np.ndarray:
        """(n, B) object ndarray of field ints (standard form)."""
        small = self.eval_small(env)
        if small is not None:
            return small.astype(object)
        bsz = env.w.shape[-1]
        acc = np.zeros((self.n, bsz), dtype=object)
        for (sv, _), cf in zip(self.terms, self.int_terms):
            gathered = env.w[:, env._map(sv.idx.reshape(-1)), :]
            ints = np.asarray(LB.limbs_to_ints(gathered), dtype=object)
            pad = len(self.shape) - len(sv.shape)
            ints = np.broadcast_to(
                ints.reshape((1,) * pad + sv.shape + (bsz,)),
                tuple(self.shape) + (bsz,),
            ).reshape(self.n, bsz)
            if cf is None:
                acc = acc + ints
            else:
                acc = acc + cf.reshape(self.n, 1) * ints
        if self.int_const is not None:
            acc = acc + self.int_const.reshape(self.n, 1)
        return acc % P

    def eval_mont(self, env: Env) -> jnp.ndarray:
        bsz = env.w.shape[-1]
        acc = None
        for sv, cl in self.terms:
            vals = env.fr(sv)
            pad = len(self.shape) - len(sv.shape)
            vals = vals.reshape((L,) + (1,) * pad + sv.shape + (bsz,))
            vals = jnp.broadcast_to(vals, (L,) + self.shape + (bsz,)).reshape(
                L, self.n, bsz
            )
            if cl is None:
                term = _to_mont_dev(vals)
            else:
                term = LB.mont_mul(LB.FR_SPEC, cl, _to_mont_dev(vals))
            acc = term if acc is None else LB.add(LB.FR_SPEC, acc, term)
        if self.const_limbs is not None:
            cterm = _to_mont_dev(
                jnp.broadcast_to(self.const_limbs, (L, self.n, bsz))
            )
            acc = cterm if acc is None else LB.add(LB.FR_SPEC, acc, cterm)
        if acc is None:
            acc = jnp.zeros((L, self.n, bsz), dtype=jnp.int32)
        return acc

    def eval_std(self, env: Env) -> jnp.ndarray:
        small = self.eval_small(env)
        if small is not None:
            return _limbs_from_i64(small)
        if self.host_eligible(env):
            return LB.ints_to_limbs(self.eval_ints(env))
        return _from_mont_dev(self.eval_mont(env))


def _eval_lc_mont(env: Env, terms, const, shape, n, bsz) -> jnp.ndarray:
    acc = None
    for sv_t, coeff in terms:
        vals = env.fr(sv_t)  # (L, *sv_shape, B)
        pad = len(shape) - len(sv_t.shape)
        vals = vals.reshape((L,) + (1,) * pad + sv_t.shape + (bsz,))
        vals = jnp.broadcast_to(vals, (L,) + tuple(shape) + (bsz,)).reshape(L, n, bsz)
        cf_arr = np.broadcast_to(np.asarray(coeff, dtype=object), shape).reshape(-1)
        if all(int(c) == 1 for c in cf_arr):
            term = _to_mont_dev(vals)
        else:
            # mont coeff (cR) * mont value (vR) -> cvR (stays in mont domain)
            cl = _coeff_limbs_mont(cf_arr)
            term = LB.mont_mul(LB.FR_SPEC, jnp.asarray(cl), _to_mont_dev(vals))
        acc = term if acc is None else LB.add(LB.FR_SPEC, acc, term)
    cf_arr = np.broadcast_to(np.asarray(const, dtype=object), shape).reshape(-1)
    if any(int(x) != 0 for x in cf_arr):
        cl = _coeff_limbs_plain(cf_arr)
        cterm = _to_mont_dev(jnp.broadcast_to(jnp.asarray(cl), (L, n, bsz)))
        acc = cterm if acc is None else LB.add(LB.FR_SPEC, acc, cterm)
    if acc is None:
        acc = jnp.zeros((L, n, bsz), dtype=jnp.int32)
    return acc


class CompiledCircuit:
    """Frozen circuit: permuted R1CS (publics first) + jittable witness eval."""

    def __init__(self, cs: ConstraintSystem):
        self.name = cs.name
        self.n_constraints = cs.n_constraints
        self.n_signals = cs.n_signals
        self.n_public = len(cs.public)
        # permutation: old index -> new index; publics occupy 1..n_pub
        perm = np.full(cs.n_signals, -1, dtype=np.int64)
        perm[0] = 0
        nxt = 1
        for p in cs.public:
            if perm[p] == -1:
                perm[p] = nxt
                nxt += 1
        self.n_public = nxt - 1
        for i in range(cs.n_signals):
            if perm[i] == -1:
                perm[i] = nxt
                nxt += 1
        self.perm = perm

        def pack(mat):
            rows = np.concatenate([r for r, _, _ in mat]) if mat else np.zeros(0, np.int64)
            cols = np.concatenate([c for _, c, _ in mat]) if mat else np.zeros(0, np.int64)
            cf = (
                np.concatenate([np.asarray(v, dtype=object) for _, _, v in mat])
                if mat
                else np.zeros(0, dtype=object)
            )
            cols = perm[cols]
            # drop zero coefficients
            nz = np.array([int(x) % P != 0 for x in cf], dtype=bool)
            return rows[nz], cols[nz], np.array([int(x) % P for x in cf[nz]], dtype=object)

        self.A = pack(cs._mats["A"])
        self.B = pack(cs._mats["B"])
        self.C = pack(cs._mats["C"])
        self.steps = cs.steps
        self.input_bindings = cs.input_bindings
        self.scopes = list(cs.scopes)
        self._eval_jit = None
        # precomputed writeback targets: signals are allocated sequentially,
        # so perm[out_idx] is almost always a contiguous run — a SLICE write
        # is a memcpy while the equivalent fancy-index write is a scatter
        # (measured ~3.1 s of the 12.5 s full640 batch-8 eager witness)
        self._wb = []
        for st in self.steps:
            pidx = perm[st.out_idx]
            if len(pidx) and (np.diff(pidx) == 1).all():
                self._wb.append(slice(int(pidx[0]), int(pidx[0]) + len(pidx)))
            else:
                self._wb.append(pidx)

    # ------------------------------------------------------------ witness
    def eval_witness(self, inputs: dict, batch: int) -> jnp.ndarray:
        """Compute the full witness (L, n_signals, B), permuted layout."""
        import jax

        traced = any(
            isinstance(x, jax.core.Tracer)
            for x in jax.tree_util.tree_leaves(inputs)
        )
        if not traced:
            # Eager fast path: a mutable numpy buffer — per-step writes are
            # in-place instead of `.at.set` copying the whole (L, n, B)
            # buffer each step (measured 80+ s of pure memcpy on the 354k-
            # signal EmailVerifier).  Step fns run jnp ops on numpy gathers.
            w = np.zeros((L, self.n_signals, batch), dtype=np.int32)
            w[0, 0, :] = 1  # ONE
            env = Env(w, inputs, self.perm)
            for step, wb in zip(self.steps, self._wb):
                vals = step.fn(env)
                w[:, wb, :] = np.asarray(vals).reshape(
                    L, len(step.out_idx), batch
                )
            return jnp.asarray(w)
        w = jnp.zeros((L, self.n_signals, batch), dtype=jnp.int32)
        w = w.at[0, 0, :].set(1)  # ONE
        env = Env(w, inputs, self.perm)
        for step in self.steps:
            vals = step.fn(env)
            w = w.at[:, self.perm[step.out_idx], :].set(
                vals.reshape(L, len(step.out_idx), batch)
            )
            env.w = w
        return w

    def witness_fn(self):
        """A jittable witness evaluator closed over static structure."""

        def f(inputs: dict):
            some = next(iter(inputs.values()))
            batch = some.shape[-1]
            return self.eval_witness(inputs, batch)

        return f

    def eval_witness_device(
        self, inputs: dict, batch: int, steps_per_segment: int = 0
    ) -> jnp.ndarray:
        """Accelerator witness evaluation: the plan compiled in SEGMENTS.

        The monolithic witness program for the full EmailVerifier (1000+
        steps) produces an HLO too large for a tunneled TPU compile endpoint
        (HTTP 413) — but each run of ~64 consecutive steps compiles fine, and
        chaining the segments with a DONATED witness buffer keeps the
        (L, n_signals, B) state resident in HBM with zero copies between
        segments. Steady-state cost is ~n_segments dispatches instead of
        ~n_steps eager ops, so the per-email latency drops with batch width
        (SURVEY §7(2): batched device witness generation).

        Compiled segments are cached on the circuit per (batch, seg) key;
        the XLA persistent cache covers cold starts across processes.
        """
        import os

        import jax

        steps_per_segment = steps_per_segment or int(
            os.environ.get("ZKEMAIL_WIT_SEG_STEPS", "64")
        )
        cache = getattr(self, "_seg_cache", None)
        if cache is None:
            cache = {}
            self._seg_cache = cache
        key = (batch, steps_per_segment)
        if key not in cache:
            perm = self.perm
            n_sig = self.n_signals

            def make_seg(steps):
                def seg(w, seg_inputs):
                    env = Env(w, seg_inputs, perm)
                    for step in steps:
                        vals = step.fn(env)
                        w = w.at[:, perm[step.out_idx], :].set(
                            vals.reshape(L, len(step.out_idx), batch)
                        )
                        env.w = w
                    return w

                return jax.jit(seg, donate_argnums=0)

            segs = []
            for s0 in range(0, len(self.steps), steps_per_segment):
                segs.append(make_seg(self.steps[s0 : s0 + steps_per_segment]))
            cache[key] = segs
        w = jnp.zeros((L, self.n_signals, batch), dtype=jnp.int32)
        w = w.at[0, 0, :].set(1)  # ONE
        for seg in cache[key]:
            w = seg(w, inputs)
        return w

    # ------------------------------------------------------------ checking
    def check_satisfied_host(self, witness_ints: np.ndarray) -> bool:
        """Python-int R1CS satisfaction check (tests; small circuits)."""
        w = [int(x) % P for x in witness_ints]

        def eval_mat(mat):
            rows, cols, cf = mat
            out = [0] * self.n_constraints
            for r, c, v in zip(rows, cols, cf):
                out[int(r)] = (out[int(r)] + int(v) * w[int(c)]) % P
            return out

        aw, bw, cw = eval_mat(self.A), eval_mat(self.B), eval_mat(self.C)
        for i in range(self.n_constraints):
            if aw[i] * bw[i] % P != cw[i]:
                return False
        return True

    def check_satisfied_device(self, witness: "jnp.ndarray") -> bool:
        """Vectorized R1CS satisfaction check: witness (L, n_signals) limbs."""
        from ..prover.groth16 import qap_vector
        from ..core import limbs as LBm

        m = 1
        while m < max(self.n_constraints, 2):
            m *= 2
        w_mont = LBm.to_mont(LBm.FR_SPEC, witness)
        aw = qap_vector(self, "A", w_mont, m)
        bw = qap_vector(self, "B", w_mont, m)
        cw = qap_vector(self, "C", w_mont, m)
        ab = LBm.mont_mul(LBm.FR_SPEC, aw, bw)
        diff = LBm.sub(LBm.FR_SPEC, ab, cw)
        ok = bool(jnp.all(diff[:, : self.n_constraints] == 0))
        return ok

    def first_unsatisfied_host(self, witness_ints) -> int | None:
        w = [int(x) % P for x in witness_ints]

        def eval_mat(mat):
            rows, cols, cf = mat
            out = [0] * self.n_constraints
            for r, c, v in zip(rows, cols, cf):
                out[int(r)] = (out[int(r)] + int(v) * w[int(c)]) % P
            return out

        aw, bw, cw = eval_mat(self.A), eval_mat(self.B), eval_mat(self.C)
        for i in range(self.n_constraints):
            if aw[i] * bw[i] % P != cw[i]:
                return i
        return None
