"""SHA-256 as R1CS constraints + one vectorized witness step.

Parity target: /root/reference/packages/circuits/lib/sha.circom —
Sha256Bytes:17, Sha256General:89 (variable length via output mux),
Sha256BytesPartial:47 / Sha256Partial:212 (midstate resume).

TPU-first design decisions:
  * Constraint emission is numpy-vectorized over (blocks, bits): because the
    round/Block chaining flows exclusively through *allocated bit signals*
    (the 35-bit sum decompositions), every round's constraints emit as one
    (n_blocks, 32)-shaped batch — ~900 vectorized emissions per instance
    instead of ~1M scalar ones.
  * ONE witness step per SHA instance runs the whole uint32 trace (lax.scan
    over blocks, unrolled 64 rounds) and scatters every allocated bit at
    once, batched over emails — replacing circom's per-signal WASM solver.

Constraint schema per block (~30k, vs. circom's ~29k):
  xor3 via 2 products/bit; Ch via 1 signed product/bit; Maj via 2; word
  additions mod 2^32 via 34/35/33-bit decompositions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core import field as F
from ..builder import LC, ConstraintSystem, SignalVec
from .sha_constants import IV_WORDS, K_WORDS

L = F.LIMBS
P = F.R


def _word_lc(bits: SignalVec) -> LC:
    """(..., 32) little-endian bit signals -> word-valued LC."""
    acc = LC([], 0)
    for j in range(32):
        acc = acc + bits[..., j] * (1 << j)
    return acc


def _bits_lc(bits: SignalVec, n: int) -> LC:
    acc = LC([], 0)
    for j in range(n):
        acc = acc + bits[..., j] * (1 << j)
    return acc


class Sha256Instance:
    """Constraints + witness plan for n_blocks chained compressions."""

    def __init__(
        self,
        cs: ConstraintSystem,
        n_blocks: int,
        get_block_words,  # fn(env) -> (n_blocks, 16, B) uint32 message words
        midstate_words: SignalVec | None = None,  # (8,) word-valued signals, or None for IV
        get_midstate=None,  # fn(env) -> (8, B) uint32, required with midstate_words
    ):
        self.cs = cs
        self.nb = nb = n_blocks
        self.get_block_words = get_block_words
        self.get_midstate = get_midstate

        # ---------------- signal allocation (witness-plan order) ----------
        self.msg_bits = cs.alloc((nb, 16, 32), "sha_msg_bits")
        self.hin_bits = cs.alloc((nb, 8, 32), "sha_hin")
        self.sched_p = cs.alloc((nb, 48, 4, 32), "sha_sched_p")  # s0:p1,p2 s1:p1,p2
        self.sched_sum = cs.alloc((nb, 48, 34), "sha_sched_sum")
        self.sig1_p = cs.alloc((nb, 64, 2, 32), "sha_sig1_p")
        self.sig0_p = cs.alloc((nb, 64, 2, 32), "sha_sig0_p")
        self.ch_p = cs.alloc((nb, 64, 32), "sha_ch_p")  # signed {-1,0,1}
        self.maj_p = cs.alloc((nb, 64, 2, 32), "sha_maj_p")
        self.e_sum = cs.alloc((nb, 64, 35), "sha_e_sum")
        self.a_sum = cs.alloc((nb, 64, 35), "sha_a_sum")
        self.hout = cs.alloc((nb, 8, 33), "sha_hout")

        for sv in (self.msg_bits, self.sched_sum, self.e_sum, self.a_sum, self.hout, self.hin_bits):
            cs.enforce_bit(sv)
        # product signals are constrained by their defining equations; bits
        # among them are implied booleans (product of booleans), but Ch
        # products are ternary so we do not bit-constrain product groups.

        self._emit_hin_constraints(midstate_words)
        self._emit_schedule()
        self._emit_rounds()
        self._emit_hout()
        self._register_witness()

    # -------------------------------------------------------------- helpers
    def _w_all(self) -> SignalVec:
        """(nb, 64, 32) message-schedule bit signals (msg ∥ sched sums)."""
        return SignalVec(
            np.concatenate(
                [self.msg_bits.idx, self.sched_sum.idx[:, :, :32]], axis=1
            )
        )

    def _a_reg(self, r: int, k: int) -> SignalVec:
        """Register {a,b,c,d}[k] entering round r, as (nb, 32) bit signals."""
        i = r - 1 - k
        if i >= 0:
            return SignalVec(self.a_sum.idx[:, i, :32])
        return SignalVec(self.hin_bits.idx[:, k - r, :])

    def _e_reg(self, r: int, k: int) -> SignalVec:
        i = r - 1 - k
        if i >= 0:
            return SignalVec(self.e_sum.idx[:, i, :32])
        return SignalVec(self.hin_bits.idx[:, 4 + k - r, :])

    # ----------------------------------------------------------- constraints
    def _emit_hin_constraints(self, midstate_words):
        cs, nb = self.cs, self.nb
        # block 0: IV constants or provided midstate
        h0 = SignalVec(self.hin_bits.idx[:1, :, :])  # (1, 8, 32)
        if midstate_words is None:
            iv_bits = np.array(
                [[(IV_WORDS[wi] >> j) & 1 for j in range(32)] for wi in range(8)],
                dtype=object,
            )[None]
            cs.enforce_equal(h0.lc(), LC([], iv_bits))
        else:
            # midstate provided as 8 word signals: word == sum of hin bits
            for wi in range(8):
                cs.enforce_equal(
                    _word_lc(SignalVec(self.hin_bits.idx[0, wi, :])),
                    LC.of(midstate_words[wi]),
                )
        # block b>0: hin[b] == hout[b-1] low 32 bits
        if nb > 1:
            cs.enforce_equal(
                SignalVec(self.hin_bits.idx[1:, :, :]).lc(),
                SignalVec(self.hout.idx[:-1, :, :32]).lc(),
            )

    def _xor3(self, b1: SignalVec, b2: SignalVec, b3_idx, b3_mask, p1: SignalVec, p2: SignalVec) -> LC:
        """(b1 ^ b2 ^ mask*b3) with product signals p1, p2. b3 given as raw
        index array + 0/1 mask (for SHR-truncated bits)."""
        cs = self.cs
        cs.enforce(b1, b2, p1)
        x12 = b1 + b2.lc() - p1 * 2
        b3 = LC([(SignalVec(b3_idx), b3_mask)])
        cs.enforce(x12, b3, p2)
        return x12 + b3 - p2 * 2

    def _emit_schedule(self):
        cs, nb = self.cs, self.nb
        w = self._w_all()  # (nb, 64, 32)
        t = np.arange(16, 64)
        j = np.arange(32)

        def gather(offset):
            return SignalVec(w.idx[:, t - offset, :])  # (nb, 48, 32)

        wm15, wm2, wm16, wm7 = gather(15), gather(2), gather(16), gather(7)

        def rot(sv: SignalVec, r: int) -> SignalVec:
            return SignalVec(sv.idx[:, :, (j + r) % 32])

        def shr(sv: SignalVec, r: int):
            src = np.minimum(j + r, 31)
            mask = np.where(j + r < 32, 1, 0).astype(object)
            return sv.idx[:, :, src], np.broadcast_to(mask, (nb, 48, 32))

        s0_b3_idx, s0_mask = shr(wm15, 3)
        s0 = self._xor3(
            rot(wm15, 7), rot(wm15, 18), s0_b3_idx, s0_mask,
            SignalVec(self.sched_p.idx[:, :, 0, :]), SignalVec(self.sched_p.idx[:, :, 1, :]),
        )
        s1_b3_idx, s1_mask = shr(wm2, 10)
        s1 = self._xor3(
            rot(wm2, 17), rot(wm2, 19), s1_b3_idx, s1_mask,
            SignalVec(self.sched_p.idx[:, :, 2, :]), SignalVec(self.sched_p.idx[:, :, 3, :]),
        )
        # sum over bit-weighted words: w[t-16] + s0 + w[t-7] + s1 == sched_sum
        pow2 = np.array([1 << jj for jj in range(32)], dtype=object)
        sum_lc = (
            LC([(wm16, pow2), (wm7, pow2)])
            + _weight_lc(s0, pow2)
            + _weight_lc(s1, pow2)
        )
        total = _reduce_bits_axis(sum_lc)
        target = _reduce_bits_axis(_weight_lc(SignalVec(self.sched_sum.idx).lc(), np.array([1 << jj for jj in range(34)], dtype=object)))
        cs.enforce_equal(total, target)

    def _emit_rounds(self):
        cs, nb = self.cs, self.nb
        w = self._w_all()
        j = np.arange(32)
        pow2_32 = np.array([1 << jj for jj in range(32)], dtype=object)
        pow2_35 = np.array([1 << jj for jj in range(35)], dtype=object)
        for r in range(64):
            a, b_, c, d = (self._a_reg(r, k) for k in range(4))
            e, f, g, h = (self._e_reg(r, k) for k in range(4))

            def rot(sv: SignalVec, rr: int) -> SignalVec:
                return SignalVec(sv.idx[:, (j + rr) % 32])

            ones = np.ones((nb, 32), dtype=object)
            sig1 = self._xor3(
                rot(e, 6), rot(e, 11), rot(e, 25).idx, ones,
                SignalVec(self.sig1_p.idx[:, r, 0, :]), SignalVec(self.sig1_p.idx[:, r, 1, :]),
            )
            sig0 = self._xor3(
                rot(a, 2), rot(a, 13), rot(a, 22).idx, ones,
                SignalVec(self.sig0_p.idx[:, r, 0, :]), SignalVec(self.sig0_p.idx[:, r, 1, :]),
            )
            # ch = g + e*(f-g)
            chp = SignalVec(self.ch_p.idx[:, r, :])
            cs.enforce(e, f - g.lc(), chp)
            ch = g + chp.lc()
            # maj: mid = b*c ; m2 = a*(b + c - 2 mid); maj = m2 + mid
            mid = SignalVec(self.maj_p.idx[:, r, 0, :])
            m2 = SignalVec(self.maj_p.idx[:, r, 1, :])
            cs.enforce(b_, c, mid)
            cs.enforce(a, b_ + c.lc() - mid * 2, m2)
            maj = m2 + mid.lc()

            wr = SignalVec(w.idx[:, r, :])
            t1 = (
                _reduce_bits_axis(_weight_lc(h.lc(), pow2_32))
                + _reduce_bits_axis(_weight_lc(sig1, pow2_32))
                + _reduce_bits_axis(_weight_lc(ch, pow2_32))
                + _reduce_bits_axis(_weight_lc(wr.lc(), pow2_32))
                + int(K_WORDS[r])
            )
            t2 = _reduce_bits_axis(_weight_lc(sig0, pow2_32)) + _reduce_bits_axis(
                _weight_lc(maj, pow2_32)
            )
            d_word = _reduce_bits_axis(_weight_lc(d.lc(), pow2_32))
            e_target = _reduce_bits_axis(
                _weight_lc(SignalVec(self.e_sum.idx[:, r, :]).lc(), pow2_35)
            )
            cs.enforce_equal(d_word + t1, e_target)
            a_target = _reduce_bits_axis(
                _weight_lc(SignalVec(self.a_sum.idx[:, r, :]).lc(), pow2_35)
            )
            cs.enforce_equal(t1 + t2, a_target)

    def _emit_hout(self):
        cs = self.cs
        pow2_32 = np.array([1 << jj for jj in range(32)], dtype=object)
        pow2_33 = np.array([1 << jj for jj in range(33)], dtype=object)
        # final registers after round 64
        regs = [self._a_reg(64, k) for k in range(4)] + [self._e_reg(64, k) for k in range(4)]
        for wi in range(8):
            hin_w = _reduce_bits_axis(
                _weight_lc(SignalVec(self.hin_bits.idx[:, wi, :]).lc(), pow2_32)
            )
            fin_w = _reduce_bits_axis(_weight_lc(regs[wi].lc(), pow2_32))
            target = _reduce_bits_axis(
                _weight_lc(SignalVec(self.hout.idx[:, wi, :]).lc(), pow2_33)
            )
            cs.enforce_equal(hin_w + fin_w, target)

    # --------------------------------------------------------------- outputs
    def state_after(self, block: int) -> SignalVec:
        """(8, 32) bit signals of the state after `block` compressions
        (block in 1..nb)."""
        return SignalVec(self.hout.idx[block - 1, :, :32])

    def all_states(self) -> SignalVec:
        """(nb, 8, 32) per-block output-state bits."""
        return SignalVec(self.hout.idx[:, :, :32])

    # --------------------------------------------------------------- witness
    def _register_witness(self):
        cs, nb = self.cs, self.nb
        get_words = self.get_block_words
        get_mid = self.get_midstate
        groups = [
            self.msg_bits, self.hin_bits, self.sched_p, self.sched_sum,
            self.sig1_p, self.sig0_p, self.ch_p, self.maj_p,
            self.e_sum, self.a_sum, self.hout,
        ]
        out_idx = np.concatenate([g.idx.reshape(-1) for g in groups])
        sv_all = SignalVec(out_idx)

        def step(env):
            eager = isinstance(env.w, np.ndarray)
            words = get_words(env)  # (nb, 16, B)
            bsz = words.shape[-1]
            if eager:
                words = np.asarray(words).astype(np.uint32)
                if get_mid is None:
                    init = np.broadcast_to(
                        np.array(IV_WORDS, dtype=np.uint32)[:, None], (8, bsz)
                    )
                else:
                    init = np.asarray(get_mid(env)).astype(np.uint32)
                trace = _sha_trace_np(init, words)
                flat = [
                    np.asarray(trace[key]).reshape(-1, bsz)
                    for key in (
                        "msg_bits", "hin", "sched_p", "sched_sum", "sig1_p",
                        "sig0_p", "ch_p", "maj_p", "e_sum", "a_sum", "hout",
                    )
                ]
                allv = np.concatenate(flat, axis=0).astype(np.int32)  # (N, B)
                neg = allv < 0
                pos = np.where(neg, 0, allv)
                lifted = np.zeros((L,) + pos.shape, dtype=np.int32)
                lifted[0] = pos & 0xFFF
                lifted[1] = (pos >> 12) & 0xFFF
                lifted[2] = (pos >> 24) & 0x7F
                if neg.any():
                    pm1 = np.array(F.to_limbs(P - 1), dtype=np.int32)[:, None]
                    lifted[:, neg] = pm1
                return lifted
            words = words.astype(jnp.uint32)
            if get_mid is None:
                init = jnp.broadcast_to(
                    jnp.asarray(np.array(IV_WORDS, dtype=np.uint32))[:, None], (8, bsz)
                )
            else:
                init = get_mid(env).astype(jnp.uint32)  # (8, B)

            trace = _sha_trace(init, words)
            flat = []
            for key, g in zip(
                ["msg_bits", "hin", "sched_p", "sched_sum", "sig1_p", "sig0_p",
                 "ch_p", "maj_p", "e_sum", "a_sum", "hout"],
                groups,
            ):
                vals = trace[key]  # int32 (g.size//?, ..., B) matching g shape + B
                flat.append(vals.reshape(-1, bsz))
            allv = jnp.concatenate(flat, axis=0).astype(jnp.int32)  # (N, B)
            # lift: values are bits except ch_p which is in {-1,0,1}
            neg = allv < 0
            pos = jnp.where(neg, 0, allv)
            limbs = [pos & 0xFFF, (pos >> 12) & 0xFFF, (pos >> 24) & 0x7F]
            z = jnp.zeros_like(pos)
            lifted = jnp.stack(limbs + [z] * (L - 3), axis=0)
            # -1 -> P-1 limbs
            pm1 = jnp.asarray(
                np.array(F.to_limbs(P - 1), dtype=np.int32)[:, None, None]
            )
            lifted = jnp.where(neg[None, :, :], pm1, lifted)
            return lifted

        cs.set_witness(sv_all, step, "sha256")


def _weight_lc(lc_or_sv, weights: np.ndarray) -> LC:
    """Multiply a bit-vector LC elementwise by per-bit weights (last axis)."""
    lc = LC.of(lc_or_sv) if not isinstance(lc_or_sv, LC) else lc_or_sv
    terms = [(sv, _mulw(c, weights)) for sv, c in lc.terms]
    const = _mulw(lc.const, weights) if _nz(lc.const) else 0
    return LC(terms, const)


def _mulw(c, w):
    if isinstance(c, np.ndarray):
        return c.astype(object) * w
    return np.asarray(w, dtype=object) * c


def _nz(c):
    if isinstance(c, np.ndarray):
        return True
    return c != 0


def _reduce_bits_axis(lc: LC) -> LC:
    """Sum an LC over its LAST axis: (…, nbits)-shaped terms -> (…,) terms.

    Implemented by splitting each term into per-bit terms (the builder emits
    one COO entry per term anyway, so this costs nothing extra).
    """
    terms = []
    const = 0
    for sv, c in lc.terms:
        nbits = sv.shape[-1]
        cf = np.broadcast_to(np.asarray(c, dtype=object), sv.shape)
        for jj in range(nbits):
            terms.append((sv[..., jj], cf[..., jj]))
    if isinstance(lc.const, np.ndarray):
        const = lc.const.sum(axis=-1)
    else:
        const = lc.const
    return LC(terms, const)


# ---------------------------------------------------------------------------
# uint32 SHA trace (witness side)
# ---------------------------------------------------------------------------

def _add_ovf(x, y):
    """uint32 add with overflow flag."""
    s = x + y
    return s, (s < x).astype(jnp.uint32)


def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


def _bits_of(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """uint32 (…, B) -> int32 (…, n, B) bits LSB-first (n <= 32), vectorized."""
    shifts = jnp.arange(n, dtype=jnp.uint32).reshape((n,) + (1,))
    return ((x[..., None, :] >> shifts) & 1).astype(jnp.int32)


def _bits_lo_hi(lo: jnp.ndarray, hi: jnp.ndarray, n: int) -> jnp.ndarray:
    """value = lo + hi*2^32 -> (…, n, B) bits."""
    lo_bits = _bits_of(lo, 32)
    hi_bits = _bits_of(hi, n - 32)
    return jnp.concatenate([lo_bits, hi_bits], axis=-2)


def _sha_trace(init_state: jnp.ndarray, words: jnp.ndarray) -> dict:
    """Full SHA-256 trace. init_state (8, B) uint32; words (nb, 16, B) uint32.

    The lax.scan body computes only word-level uint32 quantities (compact
    graph — fast XLA compile); bit extraction for the signal groups happens
    once, vectorized over (blocks, …), after the scan.
    """

    k_arr = jnp.asarray(np.array(K_WORDS, dtype=np.uint32))

    def sched_step(window, _):
        # window: (16, B) = w[t-16..t-1]
        wm15, wm2, wm16, wm7 = window[1], window[14], window[0], window[9]
        r7, r18, sh3 = _rotr(wm15, 7), _rotr(wm15, 18), wm15 >> 3
        p1_0 = r7 & r18
        p2_0 = (r7 ^ r18) & sh3
        s0 = r7 ^ r18 ^ sh3
        r17, r19, sh10 = _rotr(wm2, 17), _rotr(wm2, 19), wm2 >> 10
        p1_1 = r17 & r19
        p2_1 = (r17 ^ r19) & sh10
        s1 = r17 ^ r19 ^ sh10
        s_lo, c1 = _add_ovf(wm16, s0)
        s_lo, c2 = _add_ovf(s_lo, wm7)
        s_lo, c3 = _add_ovf(s_lo, s1)
        new_window = jnp.concatenate([window[1:], s_lo[None]], axis=0)
        return new_window, (jnp.stack([p1_0, p2_0, p1_1, p2_1]), s_lo, c1 + c2 + c3)

    def round_step(st, xs):
        a, b_, c, d, e, f, g, h = [st[i] for i in range(8)]
        wr, kr = xs
        r6, r11, r25 = _rotr(e, 6), _rotr(e, 11), _rotr(e, 25)
        p1 = r6 & r11
        p2 = (r6 ^ r11) & r25
        sig1 = r6 ^ r11 ^ r25
        ch = (e & f) ^ (~e & g)
        t1_lo, c1 = _add_ovf(h, sig1)
        t1_lo, c2 = _add_ovf(t1_lo, ch)
        t1_lo, c3 = _add_ovf(t1_lo, kr)
        t1_lo, c4 = _add_ovf(t1_lo, wr)
        t1_hi = c1 + c2 + c3 + c4
        r2, r13, r22 = _rotr(a, 2), _rotr(a, 13), _rotr(a, 22)
        q1 = r2 & r13
        q2 = (r2 ^ r13) & r22
        sig0 = r2 ^ r13 ^ r22
        mid = b_ & c
        m2 = a & (b_ ^ c)
        maj = (a & b_) ^ (a & c) ^ (b_ & c)
        es_lo, ec = _add_ovf(d, t1_lo)
        es_hi = t1_hi + ec
        t2_lo, tc = _add_ovf(sig0, maj)
        as_lo, ac = _add_ovf(t1_lo, t2_lo)
        as_hi = t1_hi + tc + ac
        new_st = jnp.stack([as_lo, a, b_, c, es_lo, e, f, g])
        outs = (
            jnp.stack([p1, p2]), jnp.stack([q1, q2]), e & f, e & g,
            jnp.stack([mid, m2]), jnp.stack([es_lo, es_hi]),
            jnp.stack([as_lo, as_hi]),
        )
        return new_st, outs

    def block_step(state, wblock):
        _, (sp, ss_lo, ss_hi) = jax.lax.scan(sched_step, wblock, None, length=48)
        w_all = jnp.concatenate([wblock, ss_lo], axis=0)  # (64, B)
        kb = jnp.broadcast_to(k_arr[:, None], (64,) + wblock.shape[1:])
        fin, (sig1_w, sig0_w, chp_w, chn_w, maj_w, es_w, as_w) = jax.lax.scan(
            round_step, state, (w_all, kb)
        )
        ho_lo, ho_hi = [], []
        for wi in range(8):
            s_lo, cc = _add_ovf(state[wi], fin[wi])
            ho_lo.append(s_lo)
            ho_hi.append(cc)
        out = {
            "msg": wblock,
            "hin_w": state,
            "sched_p_w": sp,
            "sched_lo": ss_lo,
            "sched_hi": ss_hi,
            "sig1_w": sig1_w,
            "sig0_w": sig0_w,
            "chp_w": chp_w,
            "chn_w": chn_w,
            "maj_w": maj_w,
            "es_w": es_w,
            "as_w": as_w,
            "ho_lo": jnp.stack(ho_lo, axis=0),
            "ho_hi": jnp.stack(ho_hi, axis=0),
        }
        return jnp.stack(ho_lo, axis=0), out

    _, t = jax.lax.scan(block_step, init_state, words)

    # vectorized bit extraction over (nb, …, B)
    return {
        "msg_bits": _bits_of(t["msg"], 32),
        "hin": _bits_of(t["hin_w"], 32),
        "sched_p": _bits_of(t["sched_p_w"], 32),
        "sched_sum": _bits_lo_hi(t["sched_lo"], t["sched_hi"], 34),
        "sig1_p": _bits_of(t["sig1_w"], 32),
        "sig0_p": _bits_of(t["sig0_w"], 32),
        "ch_p": _bits_of(t["chp_w"], 32) - _bits_of(t["chn_w"], 32),
        "maj_p": _bits_of(t["maj_w"], 32),
        "e_sum": _bits_lo_hi(t["es_w"][:, :, 0], t["es_w"][:, :, 1], 35),
        "a_sum": _bits_lo_hi(t["as_w"][:, :, 0], t["as_w"][:, :, 1], 35),
        "hout": _bits_lo_hi(t["ho_lo"], t["ho_hi"], 33),
    }


def _np_bits_of(x: np.ndarray, n: int) -> np.ndarray:
    shifts = np.arange(n, dtype=np.uint32).reshape((n, 1))
    return ((x[..., None, :] >> shifts) & 1).astype(np.int32)


def _np_bits_lo_hi(lo: np.ndarray, hi: np.ndarray, n: int) -> np.ndarray:
    return np.concatenate([_np_bits_of(lo, 32), _np_bits_of(hi, n - 32)], axis=-2)


def _sha_trace_np(init_state: np.ndarray, words: np.ndarray) -> dict:
    """Pure-numpy mirror of _sha_trace for the eager host witness path
    (avoids per-call jnp scan dispatch: measured 3x on the full model)."""

    def rotr(x, r):
        return ((x >> np.uint32(r)) | (x << np.uint32(32 - r))).astype(np.uint32)

    def add_ovf(x, y):
        s = (x + y).astype(np.uint32)
        return s, (s < x).astype(np.uint32)

    nb = words.shape[0]
    bsz = words.shape[-1]
    state = init_state.astype(np.uint32)
    t = {k: [] for k in (
        "msg", "hin_w", "sched_p_w", "sched_lo", "sched_hi", "sig1_w",
        "sig0_w", "chp_w", "chn_w", "maj_w", "es_w", "as_w", "ho_lo", "ho_hi",
    )}
    k_words = np.array(K_WORDS, dtype=np.uint32)
    for b in range(nb):
        wblock = words[b].astype(np.uint32)  # (16, B)
        window = wblock.copy()
        sp, ss_lo, ss_hi = [], [], []
        for _ in range(48):
            wm15, wm2, wm16, wm7 = window[1], window[14], window[0], window[9]
            r7, r18, sh3 = rotr(wm15, 7), rotr(wm15, 18), wm15 >> np.uint32(3)
            s0 = r7 ^ r18 ^ sh3
            r17, r19, sh10 = rotr(wm2, 17), rotr(wm2, 19), wm2 >> np.uint32(10)
            s1 = r17 ^ r19 ^ sh10
            sp.append(np.stack([r7 & r18, (r7 ^ r18) & sh3, r17 & r19, (r17 ^ r19) & sh10]))
            s_lo, c1 = add_ovf(wm16, s0)
            s_lo, c2 = add_ovf(s_lo, wm7)
            s_lo, c3 = add_ovf(s_lo, s1)
            ss_lo.append(s_lo)
            ss_hi.append(c1 + c2 + c3)
            window = np.concatenate([window[1:], s_lo[None]], axis=0)
        ss_lo = np.stack(ss_lo)
        w_all = np.concatenate([wblock, ss_lo], axis=0)  # (64, B)
        st = state
        sig1_w, sig0_w, chp_w, chn_w, maj_w, es_w, as_w = ([] for _ in range(7))
        for r in range(64):
            a, b_, c, d, e, f, g, h = [st[i] for i in range(8)]
            wr, kr = w_all[r], k_words[r]
            r6, r11, r25 = rotr(e, 6), rotr(e, 11), rotr(e, 25)
            sig1 = r6 ^ r11 ^ r25
            ch = (e & f) ^ (~e & g)
            t1_lo, c1 = add_ovf(h, sig1)
            t1_lo, c2 = add_ovf(t1_lo, ch)
            t1_lo, c3 = add_ovf(t1_lo, np.broadcast_to(kr, t1_lo.shape).astype(np.uint32))
            t1_lo, c4 = add_ovf(t1_lo, wr)
            t1_hi = c1 + c2 + c3 + c4
            r2, r13, r22 = rotr(a, 2), rotr(a, 13), rotr(a, 22)
            sig0 = r2 ^ r13 ^ r22
            maj = (a & b_) ^ (a & c) ^ (b_ & c)
            sig1_w.append(np.stack([r6 & r11, (r6 ^ r11) & r25]))
            sig0_w.append(np.stack([r2 & r13, (r2 ^ r13) & r22]))
            chp_w.append(e & f)
            chn_w.append(e & g)
            maj_w.append(np.stack([b_ & c, a & (b_ ^ c)]))
            es_lo, ec = add_ovf(d, t1_lo)
            es_hi = t1_hi + ec
            t2_lo, tc = add_ovf(sig0, maj)
            as_lo, ac = add_ovf(t1_lo, t2_lo)
            as_hi = t1_hi + tc + ac
            es_w.append(np.stack([es_lo, es_hi]))
            as_w.append(np.stack([as_lo, as_hi]))
            st = np.stack([as_lo, a, b_, c, es_lo, e, f, g])
        ho_lo, ho_hi = [], []
        for wi in range(8):
            s_lo, cc = add_ovf(state[wi], st[wi])
            ho_lo.append(s_lo)
            ho_hi.append(cc)
        t["msg"].append(wblock)
        t["hin_w"].append(state)
        t["sched_p_w"].append(np.stack(sp))
        t["sched_lo"].append(ss_lo)
        t["sched_hi"].append(np.stack(ss_hi))
        t["sig1_w"].append(np.stack(sig1_w))
        t["sig0_w"].append(np.stack(sig0_w))
        t["chp_w"].append(np.stack(chp_w))
        t["chn_w"].append(np.stack(chn_w))
        t["maj_w"].append(np.stack(maj_w))
        t["es_w"].append(np.stack(es_w))
        t["as_w"].append(np.stack(as_w))
        t["ho_lo"].append(np.stack(ho_lo))
        t["ho_hi"].append(np.stack(ho_hi))
        state = np.stack(ho_lo, axis=0)
    t = {k: np.stack(v, axis=0) for k, v in t.items()}
    return {
        "msg_bits": _np_bits_of(t["msg"], 32),
        "hin": _np_bits_of(t["hin_w"], 32),
        "sched_p": _np_bits_of(t["sched_p_w"], 32),
        "sched_sum": _np_bits_lo_hi(t["sched_lo"], t["sched_hi"], 34),
        "sig1_p": _np_bits_of(t["sig1_w"], 32),
        "sig0_p": _np_bits_of(t["sig0_w"], 32),
        "ch_p": _np_bits_of(t["chp_w"], 32) - _np_bits_of(t["chn_w"], 32),
        "maj_p": _np_bits_of(t["maj_w"], 32),
        "e_sum": _np_bits_lo_hi(t["es_w"][:, :, 0], t["es_w"][:, :, 1], 35),
        "a_sum": _np_bits_lo_hi(t["as_w"][:, :, 0], t["as_w"][:, :, 1], 35),
        "hout": _np_bits_lo_hi(t["ho_lo"], t["ho_hi"], 33),
    }
