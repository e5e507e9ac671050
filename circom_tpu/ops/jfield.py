"""Batched prime-field arithmetic in JAX over base-2^16 limb planes.

An element batch is ``uint32[..., L, batch]`` — limb-major, batch-minor.
The batch axis is the MINOR (lane) dimension so every elementwise op runs
at full VPU lane utilization (the TPU vector registers are 8x128; a
batch-minor layout with batch >= 128 fills them, whereas a limb-minor
layout would cap at L/128 = 12.5% for 256-bit fields).

Multiplication is vectorized Montgomery CIOS: the per-limb loops run at
trace time (L iterations of fully batched VPU ops), so one `mont_mul`
costs ~O(L^2) elementwise uint32 ops over the whole batch — no 64-bit
integers, no data-dependent control flow, XLA-fusable.

Two value domains exist at the tape level:
  * MONT — x*R mod p (R = 2^(16L)); used for mul/div/pow chains.
  * NORM — canonical [0, p); required by comparisons, bit ops, shifts and
    the .wtns output (long-normal form, reference:
    code_producers/src/c_elements/common/main.cpp:288-335).

Semantics of comparisons/shifts/bit ops follow the reference BigInt layer
(circom_algebra/src/modular_arithmetic.rs); see field/hostfield.py for the
host oracle these are tested against.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..field.primes import LIMB_BITS, FieldSpec
from .limbs import spec_constants

MASK = (1 << LIMB_BITS) - 1


def on_tpu():
    """True when the default JAX backend is a TPU.  Robust to broken
    platform plugins (a stale JAX_PLATFORMS naming an unregistered
    plugin raises RuntimeError from default_backend)."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


class JaxField:
    """Field-op kernel library for one prime, acting on uint32[..., L, B]."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        c = spec_constants(spec)
        self.L = c["L"]
        self.p = c["p"]
        # numpy constants, shaped (L, 1) to broadcast over the batch lane
        # axis; folded into the XLA graph at trace time (no eager device
        # transfers — eager dispatch is slow under the axon tunnel).
        self.n0inv = np.uint32(c["n0inv"])
        self.p_limbs = np.asarray(c["p_limbs"])[:, None]
        self.R2_limbs = np.asarray(c["R2_limbs"])[:, None]
        self.one_mont = np.asarray(c["one_mont_limbs"])[:, None]
        self.mask_limbs = np.asarray(c["mask_limbs"])[:, None]
        self.half_limbs = np.asarray(c["half_limbs"])[:, None]
        self.zero_limbs = np.zeros((self.L, 1), np.uint32)
        self.one_limbs = np.zeros((self.L, 1), np.uint32)
        self.one_limbs[0, 0] = 1

    # ------------------------------------------------------------------
    # helpers (all shapes: (..., L, B) limbs; (..., B) scalars)
    # ------------------------------------------------------------------
    def _cond_sub_p(self, r, extra_top):
        """r (uint32 limbs, value + extra_top*2^16L < 2p) -> canonical.

        Subtracts p when the (L+1)-limb value >= p; branch-free select.
        """
        L = self.L
        d = r.astype(jnp.int32) - self.p_limbs.astype(np.int32)
        limbs = []
        borrow = jnp.zeros(d.shape[:-2] + d.shape[-1:], jnp.int32)
        for i in range(L):
            v = d[..., i, :] - borrow
            limbs.append((v & MASK).astype(jnp.uint32))
            borrow = -(v >> LIMB_BITS)  # 0 or 1
        sub = jnp.stack(limbs, axis=-2)
        take_sub = (extra_top.astype(jnp.int32) - borrow) >= 0
        return jnp.where(take_sub[..., None, :], sub, r)

    def _carry16(self, cols):
        """Sequential carry propagation of uint32 columns -> (limbs, carry)."""
        n = cols.shape[-2]
        carry = jnp.zeros(cols.shape[:-2] + cols.shape[-1:], jnp.uint32)
        limbs = []
        for i in range(n):
            t = cols[..., i, :] + carry
            limbs.append(t & MASK)
            carry = t >> LIMB_BITS
        return jnp.stack(limbs, axis=-2), carry

    def _ult(self, a, b):
        """Unsigned a < b over limb arrays -> bool (..., B)."""
        borrow = jnp.zeros(jnp.broadcast_shapes(
            a.shape[:-2] + a.shape[-1:], b.shape[:-2] + b.shape[-1:]),
            jnp.int32)
        for i in range(self.L):
            v = (a[..., i, :].astype(jnp.int32)
                 - b[..., i, :].astype(jnp.int32) - borrow)
            borrow = -(v >> LIMB_BITS)
        return borrow > 0

    def _is_neg(self, a):
        """Signed-convention negativity: a > p//2 (modular_arithmetic.rs:154)."""
        return self._ult(self.half_limbs, a)

    # ------------------------------------------------------------------
    # ring ops (domain-agnostic: work in both MONT and NORM)
    # ------------------------------------------------------------------
    def add(self, a, b):
        if on_tpu():
            B = jnp.broadcast_shapes(a.shape, b.shape)[-1]
            if B % 8 == 0:
                return self._pallas_binop("add")(a, b)
        limbs, carry = self._carry16(a + b)
        return self._cond_sub_p(limbs, carry)

    def _pallas_binop(self, which):
        cache = getattr(self, "_pallas_cache", None)
        if cache is None:
            cache = self._pallas_cache = {}
        if which not in cache:
            from .pallas_field import make_add, make_sub

            cache[which] = (make_add if which == "add" else make_sub)(
                self.spec)
        return cache[which]

    def sub(self, a, b):
        if on_tpu():
            B = jnp.broadcast_shapes(a.shape, b.shape)[-1]
            if B % 8 == 0:
                return self._pallas_binop("sub")(a, b)
        return self._sub_xla(a, b)

    def _sub_xla(self, a, b):
        v = (a + self.p_limbs).astype(jnp.int32) - b.astype(jnp.int32)
        carry = jnp.zeros(v.shape[:-2] + v.shape[-1:], jnp.int32)
        limbs = []
        for i in range(self.L):
            t = v[..., i, :] + carry
            limbs.append((t & MASK).astype(jnp.uint32))
            carry = t >> LIMB_BITS
        r = jnp.stack(limbs, axis=-2)
        return self._cond_sub_p(r, carry.astype(jnp.uint32))

    def neg(self, a):
        return self.sub(jnp.broadcast_to(self.zero_limbs, a.shape), a)

    def mont_mul(self, a, b):
        """(aR)(bR)R^-1 = abR mod p — vectorized CIOS over 16-bit limbs.

        Two tracings of the same algorithm:
        * TPU: column accumulator as a Python LIST of (..., B) arrays —
          every update is a fresh SSA value that XLA fuses into one kernel.
          (A `cols.at[slice].add` accumulator forces the whole column
          tensor through HBM on every partial product — measured ~50x
          slower on TPU.)
        * CPU (tests): array accumulator — ~6x smaller XLA graph; the CPU
          backend's compile time explodes on the unrolled list form and
          test runtime does not matter.
        """
        if on_tpu():
            B = jnp.broadcast_shapes(a.shape, b.shape)[-1]
            if B % 8 == 0:
                return self._pallas_mm(a, b)
            return self._mont_mul_list(a, b)
        return self._mont_mul_array(a, b)

    @property
    def _pallas_mm(self):
        """Fused Pallas CIOS kernel — the production TPU multiply
        (ops/pallas_field.py); XLA fails to fuse the ~1500-op unrolled
        chain and spills intermediates to HBM (~30x slower)."""
        fn = getattr(self, "_pallas_mm_fn", None)
        if fn is None:
            from .pallas_field import make_mont_mul

            fn = make_mont_mul(self.spec)
            self._pallas_mm_fn = fn
        return fn

    def _mont_mul_list(self, a, b):
        L = self.L
        a_l = [a[..., i, :] for i in range(L)]
        b_l = [b[..., j, :] for j in range(L)]
        cols = [None] * (2 * L + 1)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(L):
            for j in range(L):
                prod = a_l[i] * b_l[j]  # exact: < 2^32
                acc(i + j, prod & MASK)
                acc(i + j + 1, prod >> LIMB_BITS)
        return self._mont_reduce_list(cols)

    def _mont_mul_array(self, a, b):
        L = self.L
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        lead, B = shape[:-2], shape[-1]
        cols = jnp.zeros(lead + (2 * L + 1, B), jnp.uint32)
        for i in range(L):
            prod = a[..., i : i + 1, :] * b  # exact: < 2^32
            cols = cols.at[..., i : i + L, :].add(prod & MASK)
            cols = cols.at[..., i + 1 : i + L + 1, :].add(prod >> LIMB_BITS)
        return self._mont_reduce_array(cols)

    def _mont_reduce_array(self, cols):
        L = self.L
        shape = cols.shape[:-2] + cols.shape[-1:]
        carry = jnp.zeros(shape, jnp.uint32)
        for i in range(L):
            t = cols[..., i, :] + carry
            m = (t * self.n0inv) & MASK
            mp = m[..., None, :] * self.p_limbs  # exact: < 2^32
            carry = (t + (mp[..., 0, :] & MASK)) >> LIMB_BITS
            if L > 1:
                cols = cols.at[..., i + 1 : i + L, :].add(
                    mp[..., 1:, :] & MASK)
            cols = cols.at[..., i + 1 : i + L + 1, :].add(mp >> LIMB_BITS)
        limbs = []
        for k in range(L, 2 * L + 1):
            t = cols[..., k, :] + carry
            limbs.append(t & MASK)
            carry = t >> LIMB_BITS
        r = jnp.stack(limbs[:L], axis=-2)
        return self._cond_sub_p(r, limbs[L])

    def mont_reduce_cols(self, cols):
        """Array form of the CIOS reduction tail (used by the R1CS checker
        on wide segment sums): uint32 (..., <=2L+1, B) columns, each
        < ~2^22, value V < R*p  ->  V*R^-1 mod p."""
        if on_tpu():
            n = cols.shape[-2]
            return self._mont_reduce_list(
                [cols[..., k, :] for k in range(n)])
        if cols.shape[-2] < 2 * self.L + 1:
            pad = jnp.zeros(
                cols.shape[:-2] + (2 * self.L + 1 - cols.shape[-2],)
                + cols.shape[-1:], jnp.uint32)
            cols = jnp.concatenate([cols, pad], axis=-2)
        return self._mont_reduce_array(cols)

    def _mont_reduce_list(self, cols):
        L = self.L
        p_l = [int(x) for x in self.p_limbs[:, 0]]
        zero = jnp.zeros((), jnp.uint32)
        cols = [c if c is not None else zero for c in cols]
        while len(cols) < 2 * L + 1:
            cols.append(zero)
        carry = zero
        for i in range(L):
            t = cols[i] + carry
            m = (t * self.n0inv) & MASK
            prod0 = m * np.uint32(p_l[0])  # exact: < 2^32
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
        r = jnp.stack(
            [jnp.broadcast_to(x, limbs[0].shape) for x in limbs[:L]],
            axis=-2)
        return self._cond_sub_p(r, limbs[L])

    def to_mont(self, a):
        return self.mont_mul(a, self.R2_limbs)

    def from_mont(self, a):
        return self.mont_mul(a, self.one_limbs)

    def mul_norm(self, a, b):
        """Product of two NORM-domain values, NORM result (2 Montgomery muls)."""
        return self.mont_mul(self.mont_mul(a, b), self.R2_limbs)

    def pow_mont(self, a, e):
        """a^e with a in MONT form, static Python-int exponent e >= 0.

        Uniform fori_loop over the bits of e keeps the XLA graph O(1) in e.
        """
        if e == 0:
            return jnp.broadcast_to(self.one_mont, a.shape)
        nbits = e.bit_length()
        ebits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(nbits)], np.bool_)
        )

        def body(i, acc):
            acc = self.mont_mul(acc, acc)
            bit = ebits[nbits - 1 - i]
            return jnp.where(bit, self.mont_mul(acc, a), acc)

        init = jnp.broadcast_to(self.one_mont, a.shape)
        return jax.lax.fori_loop(0, nbits, body, init)

    def inv_mont(self, a):
        """Fermat inversion a^(p-2); 0 maps to 0 (the compiler rejects /0
        when it can; runtime semantics raise in the host path)."""
        return self.pow_mont(a, self.p - 2)

    def div_mont(self, a, b):
        return self.mont_mul(a, self.inv_mont(b))

    # ------------------------------------------------------------------
    # NORM-domain ops (comparisons, bit ops, shifts, booleans)
    # ------------------------------------------------------------------
    def _bit(self, cond):
        """bool (..., B) -> {0,1} field value in NORM limbs (..., L, B)."""
        z = jnp.zeros(cond.shape[:-1] + (self.L,) + cond.shape[-1:],
                      jnp.uint32)
        return z.at[..., 0, :].set(cond.astype(jnp.uint32))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-2)

    def as_bool(self, a):
        return jnp.any(a != 0, axis=-2)

    def eq(self, a, b):
        return self._bit(jnp.all(a == b, axis=-2))

    def neq(self, a, b):
        return self._bit(jnp.any(a != b, axis=-2))

    def _lt_signed(self, a, b):
        na, nb = self._is_neg(a), self._is_neg(b)
        return jnp.where(na ^ nb, na, self._ult(a, b))

    def lt(self, a, b):
        return self._bit(self._lt_signed(a, b))

    def le(self, a, b):
        return self._bit(~self._lt_signed(b, a))

    def gt(self, a, b):
        return self._bit(self._lt_signed(b, a))

    def ge(self, a, b):
        return self._bit(~self._lt_signed(a, b))

    def bool_and(self, a, b):
        return self._bit(self.as_bool(a) & self.as_bool(b))

    def bool_or(self, a, b):
        return self._bit(self.as_bool(a) | self.as_bool(b))

    def bool_not(self, a):
        return self._bit(self.is_zero(a))

    def bit_and(self, a, b):
        return a & b  # <= min(a,b) < p

    def bit_or(self, a, b):
        r = a | b  # < 2^bits <= 2p - 1
        return self._cond_sub_p(r, jnp.zeros(r.shape[:-2] + r.shape[-1:],
                                             jnp.uint32))

    def bit_xor(self, a, b):
        r = a ^ b
        return self._cond_sub_p(r, jnp.zeros(r.shape[:-2] + r.shape[-1:],
                                             jnp.uint32))

    def complement(self, a):
        """~a over p.bit_length() bits, mod p (modular_arithmetic.rs:94-109)."""
        r = a ^ self.mask_limbs
        return self._cond_sub_p(r, jnp.zeros(r.shape[:-2] + r.shape[-1:],
                                             jnp.uint32))

    def shift_r_const(self, a, k: int):
        """a >> k, static k already wrap-normalized to [0, bits)."""
        L, q, r = self.L, k // LIMB_BITS, k % LIMB_BITS
        z = jnp.zeros_like(a[..., 0, :])
        out = []
        for j in range(L):
            lo = a[..., j + q, :] if j + q < L else z
            hi = a[..., j + q + 1, :] if j + q + 1 < L else z
            v = (lo >> r) | ((hi << (LIMB_BITS - r)) & MASK) if r else lo
            out.append(v)
        return jnp.stack(out, axis=-2)

    def shift_l_const(self, a, k: int):
        """(a << k) & mask, mod p; static k in [0, bits)."""
        L, q, r = self.L, k // LIMB_BITS, k % LIMB_BITS
        z = jnp.zeros_like(a[..., 0, :])
        out = []
        for j in range(L):
            lo = a[..., j - q, :] if j - q >= 0 else z
            hi = a[..., j - q - 1, :] if j - q - 1 >= 0 else z
            v = ((lo << r) & MASK) | (hi >> (LIMB_BITS - r)) if r else lo
            out.append(v)
        res = jnp.stack(out, axis=-2) & self.mask_limbs
        return self._cond_sub_p(res, jnp.zeros(res.shape[:-2] + res.shape[-1:],
                                               jnp.uint32))

    def idiv(self, a, b):
        """Integer division of canonical representatives (a // b) by
        limb-level binary long division over p.bit_length() steps
        (modular_arithmetic.rs:48-57 semantics).  idiv(a, 0) = 0 — the
        documented batched-TPU contract (the host calculator raises;
        a batch cannot abort per element).

        The remainder register R needs bits+1 bits transiently after
        the shift-in step; the bit shifted out of the top limb is
        tracked separately (``topbit``) and forces the subtract (when
        set, R >= 2^(16L) > b, and the wraparound difference mod
        2^(16L) equals the true difference since it is < b < 2^(16L)).
        """
        L = self.L
        BITS = self.p.bit_length()
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        bz = self.is_zero(b)[..., None, :]

        def body(t, carry):
            R, Q = carry
            i = BITS - 1 - t
            li = i // LIMB_BITS
            sh = (i % LIMB_BITS).astype(jnp.uint32)
            la = jax.lax.dynamic_index_in_dim(a, li, axis=a.ndim - 2,
                                              keepdims=False)
            bit = (la >> sh) & 1
            topbit = R[..., L - 1, :] >> (LIMB_BITS - 1)
            rs = [((R[..., 0, :] << 1) & MASK) | bit]
            for j in range(1, L):
                rs.append(((R[..., j, :] << 1) & MASK)
                          | (R[..., j - 1, :] >> (LIMB_BITS - 1)))
            # wraparound Rs - b (valid whenever the subtract is taken)
            borrow = jnp.zeros_like(bit, jnp.int32)
            subs = []
            for j in range(L):
                v = rs[j].astype(jnp.int32) \
                    - b[..., j, :].astype(jnp.int32) - borrow
                subs.append((v & MASK).astype(jnp.uint32))
                borrow = -(v >> LIMB_BITS)
            ge = (topbit != 0) | (borrow == 0)
            Rn = jnp.stack(
                [jnp.where(ge, subs[j], rs[j]) for j in range(L)],
                axis=-2)
            qbit = jnp.where(ge, jnp.uint32(1) << sh, jnp.uint32(0))
            onehot = (jnp.arange(L) == li).astype(jnp.uint32)[:, None]
            Qn = Q | (onehot * qbit[..., None, :])
            return Rn, Qn

        z = jnp.zeros(shape, jnp.uint32)
        _, q = jax.lax.fori_loop(0, BITS, body, (z, z))
        return jnp.where(bz, 0, q)

    def imod(self, a, b):
        """a mod b over canonical representatives; mod(a, 0) = a (see
        ``idiv``).  Exact via a - (a//b)*b: the product and difference
        stay below p, so plain field ops equal the integer ops."""
        return self.sub(a, self.mul_norm(self.idiv(a, b), b))

    def select(self, cond_val, a, b):
        """circom ?: — cond is a field value (NORM), picks a when nonzero."""
        return jnp.where(self.as_bool(cond_val)[..., None, :], a, b)

    def select_bool(self, cond, a, b):
        return jnp.where(cond[..., None, :], a, b)

    # host-side conversion helpers -------------------------------------
    def encode(self, values, mont=False):
        """List of python ints -> (L, N) device-ready numpy array."""
        from .limbs import ints_to_limbs

        R = 1 << (LIMB_BITS * self.L)
        if mont:
            values = [(v * R) % self.p for v in values]
        return ints_to_limbs(values, self.L).T.copy()

    def decode(self, arr, mont=False):
        """(..., L, N) -> flat list of ints (over leading dims and N)."""
        from .limbs import limbs_to_int

        arr = np.asarray(arr)
        arr = np.moveaxis(arr, -2, -1)  # (..., N, L)
        flat = arr.reshape(-1, self.L)
        vals = [limbs_to_int(row) for row in flat]
        if mont:
            Rinv = pow(1 << (LIMB_BITS * self.L), -1, self.p)
            vals = [(v * Rinv) % self.p for v in vals]
        return vals
