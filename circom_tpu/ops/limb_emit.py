"""Limb-row op emitters shared by the fused TPU backends.

Emits the reference field semantics (circom_algebra/src/
modular_arithmetic.rs: Montgomery mul, signed comparison via p/2,
masked bitwise ops, shift wraparound) as straight-line ops over limb
*rows*: a field element is L rows, each a uint32 (8, bb) tile (or a
numpy scalar for compile-time constants — zero limbs of constant
multiplicands are skipped at trace time).

Used by backend/segments.py (rows read from block refs, constants
inline) and backend/interp.py (rows read from a VMEM register file /
SMEM constant bank at dynamic indices).
"""

import numpy as np
import jax.numpy as jnp

from ..field.primes import LIMB_BITS, FieldSpec
from .limbs import spec_constants

MASK = (1 << LIMB_BITS) - 1

# goldilocks: p = 2^64 - 2^32 + 1, so 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 —
# products reduce by FOLDING instead of Montgomery (the TPU analog of
# the reference's dedicated 64-bit runtime, c_elements/common64/,
# RELEASES.md:34 "dramatically improves witness generation efficiency")
GOLDILOCKS_P = 18446744069414584321


def _row(r, zero):
    """Materialize a row (numpy scalar or (8,bb) array) as an array."""
    if isinstance(r, (np.uint32, np.int32, int)):
        return jnp.full(zero.shape, np.uint32(r), jnp.uint32)
    if r.shape != zero.shape:
        return jnp.broadcast_to(r, zero.shape)
    return r


class LimbEmitter:
    """Stateless-per-op emitter; ``rd(k, i)`` reads limb row i of
    operand k and may return a jnp array or a numpy uint32 scalar."""

    def __init__(self, spec: FieldSpec):
        c = spec_constants(spec)
        self.L = c["L"]
        self.n0inv = np.uint32(c["n0inv"])
        self.p_list = [int(x) for x in c["p_limbs"]]
        self.r2_list = [int(x) for x in c["R2_limbs"]]
        self.mask_list = [int(x) for x in c["mask_limbs"]]
        self.half_list = [int(x) for x in c["half_limbs"]]
        self.is_goldilocks = spec.p == GOLDILOCKS_P

    # -- helpers ---------------------------------------------------------
    def cond_sub(self, limbs, top, zero):
        """Canonicalize a value < 2p given L limb rows + top carry row."""
        L, p_l = self.L, self.p_list
        borrow = zero.astype(jnp.int32)
        subbed = []
        for i in range(L):
            v = limbs[i].astype(jnp.int32) - np.int32(p_l[i]) - borrow
            subbed.append((v & MASK).astype(jnp.uint32))
            borrow = -(v >> LIMB_BITS)
        take = (top.astype(jnp.int32) - borrow) >= 0
        return [jnp.where(take, subbed[i],
                          jnp.broadcast_to(limbs[i], zero.shape))
                for i in range(L)]

    @staticmethod
    def _i32(r):
        if isinstance(r, np.uint32):
            return np.int32(int(r))
        return r.astype(jnp.int32)

    # -- ops --------------------------------------------------------------
    def emit(self, op, rd, imm, zero):
        """Returns a list of L rows for one op."""
        L = self.L
        p_l = self.p_list
        _i32 = self._i32

        def as_bool(k):
            acc = None
            for i in range(L):
                r = rd(k, i)
                if isinstance(r, np.uint32):
                    if int(r):
                        return True  # statically nonzero
                    continue
                acc = r if acc is None else (acc | r)
            return (acc != 0) if acc is not None else (zero != 0)

        def bit(mask):
            row0 = jnp.where(mask, jnp.uint32(1), jnp.uint32(0))
            return [row0] + [zero] * (L - 1)

        def ult(ka, kb):
            borrow = zero.astype(jnp.int32)
            for i in range(L):
                v = _i32(rd(ka, i)) - _i32(rd(kb, i)) - borrow
                borrow = -(v >> LIMB_BITS)
            return borrow > 0

        def is_neg(k):
            # signed convention: value > p/2 (modular_arithmetic.rs:154)
            borrow = zero.astype(jnp.int32)
            for i in range(L):
                v = np.int32(self.half_list[i]) - _i32(rd(k, i)) - borrow
                borrow = -(v >> LIMB_BITS)
            return borrow > 0

        def lt_signed(ka, kb):
            # (na^nb ? na : ult) in pure bitwise form: Mosaic rejects
            # select_n on i1 vectors ("unsupported target bitwidth")
            na, nb = is_neg(ka), is_neg(kb)
            d = na ^ nb
            return (d & na) | (~d & ult(ka, kb))

        if op == "mul":
            return self.emit_mul(rd, zero)
        if op == "gmul":
            return self.gl_mul(rd, zero)
        if op == "mulp":
            if self.is_goldilocks:
                return self.gl_mul(rd, zero)
            # plain product a*b mod p: montmul then scale by R^2
            rows = self.emit_mul(rd, zero)

            def rd2(k, i):
                if k == 1:
                    return np.uint32(self.r2_list[i])
                return rows[i]

            return self.emit_mul(rd2, zero)
        if op == "add":
            carry = zero
            limbs = []
            for i in range(L):
                t = rd(0, i) + rd(1, i) + carry
                limbs.append(t & MASK)
                carry = t >> LIMB_BITS
            return self.cond_sub(limbs, carry, zero)
        if op == "sub":
            carry = zero.astype(jnp.int32)
            limbs = []
            for i in range(L):
                v = (_i32(rd(0, i)) + np.int32(p_l[i])
                     - _i32(rd(1, i)) + carry)
                limbs.append((v & MASK).astype(jnp.uint32))
                carry = v >> LIMB_BITS
            return self.cond_sub(limbs, carry.astype(jnp.uint32), zero)
        if op == "select":
            m = as_bool(0)
            if m is True:
                return [_row(rd(1, i), zero) for i in range(L)]
            return [jnp.where(m, _row(rd(1, i), zero), _row(rd(2, i), zero))
                    for i in range(L)]
        if op in ("eq", "neq"):
            acc = None
            for i in range(L):
                e = rd(0, i) == rd(1, i)
                acc = e if acc is None else (acc & e)
            acc = jnp.broadcast_to(acc, zero.shape)
            return bit(acc if op == "eq" else ~acc)
        if op == "lt":
            return bit(lt_signed(0, 1))
        if op == "le":
            return bit(~lt_signed(1, 0))
        if op == "gt":
            return bit(lt_signed(1, 0))
        if op == "ge":
            return bit(~lt_signed(0, 1))
        if op == "land":
            return bit(as_bool(0) & as_bool(1))
        if op == "lor":
            return bit(as_bool(0) | as_bool(1))
        if op == "lnot":
            return bit(~as_bool(0))
        if op == "band":
            return [_row(rd(0, i) & rd(1, i), zero) for i in range(L)]
        if op in ("bor", "bxor"):
            f = (lambda x, y: x | y) if op == "bor" else (lambda x, y: x ^ y)
            limbs = [_row(f(rd(0, i), rd(1, i)), zero) for i in range(L)]
            return self.cond_sub(limbs, zero, zero)
        if op == "bnot":
            limbs = [_row(rd(0, i) ^ np.uint32(self.mask_list[i]), zero)
                     for i in range(L)]
            return self.cond_sub(limbs, zero, zero)
        if op in ("shr_k", "shl_k"):
            q, r = imm // LIMB_BITS, imm % LIMB_BITS
            out = []
            if op == "shr_k":
                for j in range(L):
                    lo = rd(0, j + q) if j + q < L else zero
                    hi = rd(0, j + q + 1) if j + q + 1 < L else zero
                    v = ((lo >> r) | ((hi << (LIMB_BITS - r)) & MASK)) \
                        if r else lo
                    out.append(_row(v, zero))
                return out
            for j in range(L):
                lo = rd(0, j - q) if j - q >= 0 else zero
                hi = rd(0, j - q - 1) if j - q - 1 >= 0 else zero
                v = (((lo << r) & MASK) | (hi >> (LIMB_BITS - r))) \
                    if r else lo
                out.append(_row(v & np.uint32(self.mask_list[j]), zero))
            return self.cond_sub(out, zero, zero)
        raise NotImplementedError(op)

    def mont_reduce_rows(self, cols, zero):
        """Non-interleaved Montgomery reduction tail: 2L+1 column rows
        (each < ~2^23, so sums of several convolutions are fine) ->
        canonical limb rows.  Used by the fused dot ops, which
        accumulate multiple products into one column set and reduce
        once (the lazy-reduction trick: an MDS row costs 3 convs + 1
        reduction instead of 3 full CIOS muls)."""
        L, p_l, n0inv = self.L, self.p_list, self.n0inv
        cols = list(cols)
        while len(cols) < 2 * L + 1:
            cols.append(zero)
        carry = zero
        for i in range(L):
            t = cols[i] + carry
            m = (t * n0inv) & MASK
            prod0 = m * np.uint32(p_l[0])
            carry = (t + (prod0 & MASK)) >> LIMB_BITS
            cols[i + 1] = cols[i + 1] + (prod0 >> LIMB_BITS)
            for j in range(1, L):
                pr = m * np.uint32(p_l[j])
                cols[i + j] = cols[i + j] + (pr & MASK)
                cols[i + j + 1] = cols[i + j + 1] + (pr >> LIMB_BITS)
        limbs = []
        for k in range(L, 2 * L + 1):
            t = cols[k] + carry
            limbs.append(t & MASK)
            carry = t >> LIMB_BITS
        return self.cond_sub(limbs[:L], limbs[L], zero)

    def gl_mul(self, rd, zero):
        """Goldilocks plain product a*b mod p via FOLDING.

        With 16-bit limb columns c_0..c_7 of the double-wide product,
        2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 give the exact fold
            r = [c0-c4-c6, c1-c5-c7, c2+c4, c3+c5]   (|r_i| < 2^21)
        then two signed carry chains + a select-add fixup for the
        remaining top carry (∈ {-1,0,1}) + one conditional subtract.
        ~2x fewer VPU ops than Montgomery CIOS, and the plain domain
        removes every to_mont/from_mont conversion."""
        L = self.L
        assert L == 4 and self.is_goldilocks
        izero = zero.astype(jnp.int32)

        b_is_const = isinstance(rd(1, 0), np.uint32)
        a_is_const = isinstance(rd(0, 0), np.uint32)
        ka, kb = (1, 0) if (a_is_const and not b_is_const) else (0, 1)
        b_const = isinstance(rd(kb, 0), np.uint32)

        cols = [zero] * 8
        for i in range(L):
            ai = rd(ka, i)
            for j in range(L):
                bj = rd(kb, j)
                if b_const and not int(bj):
                    continue
                prod = ai * bj  # exact: both < 2^16
                cols[i + j] = cols[i + j] + (prod & MASK)
                cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
        c = [x.astype(jnp.int32) if hasattr(x, "astype") else x
             for x in cols]
        d = [c[0] - c[4] - c[6], c[1] - c[5] - c[7],
             c[2] + c[4], c[3] + c[5]]

        def schain(vals):
            carry = izero
            out = []
            for i in range(L):
                v = vals[i] + carry
                out.append(v & np.int32(MASK))
                carry = v >> LIMB_BITS  # arithmetic: signed carries
            return out, carry

        a1, t = schain(d)
        # fold t*2^64 ≡ t*2^32 - t
        b1, t2 = schain([a1[0] - t, a1[1], a1[2] + t, a1[3]])
        # t2 ∈ {-1,0,1}: value ≡ b + t2*(2^32-1); adjustment by select
        pos = [np.int32(0xFFFF), np.int32(0xFFFF), izero, izero]
        # -(2^32-1) ≡ p - 2^32 + 1 = [2, 0, 0xFFFE, 0xFFFF]
        neg = [np.int32(2), izero, np.int32(0xFFFE), np.int32(0xFFFF)]
        is_p = t2 > 0
        is_n = t2 < 0
        adj = [jnp.where(is_p, jnp.broadcast_to(pos[i], zero.shape),
                         jnp.where(is_n,
                                   jnp.broadcast_to(neg[i], zero.shape),
                                   izero))
               for i in range(L)]
        f1, t3 = schain([b1[i] + adj[i] for i in range(L)])
        # t3 ∈ {0,1} and the +2^32-1 fixup provably cannot carry again
        fix = jnp.where(t3 > 0, jnp.int32(0xFFFF), jnp.int32(0))
        g1, _ = schain([f1[0] + fix, f1[1] + fix, f1[2], f1[3]])
        limbs = [x.astype(jnp.uint32) for x in g1]
        return self.cond_sub(limbs, zero, zero)

    def emit_mul(self, rd, zero):
        """Interleaved Montgomery CIOS on limb rows; constant operands
        come in as numpy scalars with zero limbs skipped."""
        L = self.L
        p_l = self.p_list
        n0inv = self.n0inv

        b_is_const = isinstance(rd(1, 0), np.uint32)
        a_is_const = isinstance(rd(0, 0), np.uint32)
        ka, kb = (1, 0) if (a_is_const and not b_is_const) else (0, 1)
        b_const = isinstance(rd(kb, 0), np.uint32)

        cols = [zero] * (L + 2)
        for i in range(L):
            ai = rd(ka, i)
            for j in range(L):
                bj = rd(kb, j)
                if b_const and not int(bj):
                    continue
                prod = ai * bj  # exact: both < 2^16
                cols[j] = cols[j] + (prod & MASK)
                cols[j + 1] = cols[j + 1] + (prod >> LIMB_BITS)
            # one reduction step: clear cols[0], shift down
            t = cols[0]
            m = (t * n0inv) & MASK
            prod0 = m * np.uint32(p_l[0])
            carry0 = (t + (prod0 & MASK)) >> LIMB_BITS
            nxt = [cols[k + 1] for k in range(L + 1)] + [zero]
            nxt[0] = nxt[0] + carry0 + (prod0 >> LIMB_BITS)
            for j in range(1, L):
                pr = m * np.uint32(p_l[j])
                nxt[j - 1] = nxt[j - 1] + (pr & MASK)
                nxt[j] = nxt[j] + (pr >> LIMB_BITS)
            cols = nxt
        carry = zero
        limbs = []
        for k in range(L + 1):
            t = cols[k] + carry
            limbs.append(t & MASK)
            carry = t >> LIMB_BITS
        return self.cond_sub(limbs[:L], limbs[L], zero)
