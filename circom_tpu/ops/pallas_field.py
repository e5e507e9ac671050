"""Pallas TPU kernels for field arithmetic (SURVEY.md §7.3 hard part #1).

`mont_mul_pallas`: fused Montgomery CIOS multiply over base-2^16 limb
planes, uint32, limb-major/batch-minor (L, B) blocks in VMEM.  The whole
school-book convolution + reduction runs inside one kernel — every
intermediate column lives in vector registers/VMEM, nothing round-trips
through HBM (the XLA-traced form materializes intermediates and is
memory/compile-time bound).

Falls back to interpret mode off-TPU (tests).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.primes import LIMB_BITS, FieldSpec
from .limbs import spec_constants
from .jfield import on_tpu

MASK = (1 << LIMB_BITS) - 1


@functools.lru_cache(maxsize=None)
def _consts(spec: FieldSpec):
    c = spec_constants(spec)
    return c


def make_mont_mul(spec: FieldSpec, block_b: int = 1024,
                  interpret: bool | None = None):
    """Returns fn(a, b) -> abR^-1 mod p for uint32 arrays (..., L, B)."""
    c = _consts(spec)
    L = c["L"]
    p_np = np.asarray(c["p_limbs"], np.uint32)
    p_list = [int(x) for x in p_np]
    n0inv = np.uint32(c["n0inv"])

    def kernel(a_ref, b_ref, o_ref):
        # True interleaved CIOS: only L+2 columns live at any point, so
        # the working set fits the vector register file.  Limb rows are
        # read from VMEM refs lazily inside the loops — preloading all
        # 2L rows pins ~130 vregs and spills (measured 70x slower).
        zero = jnp.zeros_like(a_ref[0, 0])
        cols = [zero] * (L + 2)
        for i in range(L):
            ai = a_ref[0, i]
            for j in range(L):
                prod = ai * b_ref[0, j]  # exact: < 2^32
                cols[j] = cols[j] + (prod & MASK)
                cols[j + 1] = cols[j + 1] + (prod >> LIMB_BITS)
            # one Montgomery reduction step: clear cols[0], shift down
            t = cols[0]
            m = (t * n0inv) & MASK
            prod0 = m * np.uint32(p_list[0])
            carry0 = (t + (prod0 & MASK)) >> LIMB_BITS
            nxt = [cols[k + 1] for k in range(L + 1)] + [zero]
            nxt[0] = nxt[0] + carry0 + (prod0 >> LIMB_BITS)
            for j in range(1, L):
                pr = m * np.uint32(p_list[j])
                nxt[j - 1] = nxt[j - 1] + (pr & MASK)
                nxt[j] = nxt[j] + (pr >> LIMB_BITS)
            cols = nxt
        # final carry propagation: value in cols[0..L] (< 2p)
        carry = zero
        limbs = []
        for k in range(L + 1):
            t = cols[k] + carry
            limbs.append(t & MASK)
            carry = t >> LIMB_BITS
        # conditional subtract p
        borrow = jnp.zeros_like(limbs[0], dtype=jnp.int32)
        subbed = []
        for i in range(L):
            v = limbs[i].astype(jnp.int32) - np.int32(p_list[i]) - borrow
            subbed.append((v & MASK).astype(jnp.uint32))
            borrow = -(v >> LIMB_BITS)
        take = (limbs[L].astype(jnp.int32) - borrow) >= 0
        for i in range(L):
            o_ref[0, i] = jnp.where(take, subbed[i], limbs[i])

    interp = (not on_tpu()) if interpret is None \
        else interpret

    def call4d(a, b):
        # a, b: (N, L, 8, B8)
        N, _L, _S8, B8 = a.shape
        bb = min(block_b // 8, B8)
        grid = (N, pl.cdiv(B8, bb))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, L, 8, B8), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, L, 8, bb), lambda s, g: (s, 0, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, 8, bb), lambda s, g: (s, 0, 0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, L, 8, bb), lambda s, g: (s, 0, 0, g),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(a, b)

    def fn(a, b):
        a = jnp.asarray(a, jnp.uint32)
        b = jnp.asarray(b, jnp.uint32)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        L_, B = shape[-2], shape[-1]
        if B % 8 == 0:
            sub, B8 = 8, B // 8
        else:
            sub, B8 = 1, B
        a4 = a.reshape((-1, L_, sub, B8) if sub == 8
                       else (-1, L_, 1, B))
        b4 = b.reshape((-1, L_, sub, B8) if sub == 8
                       else (-1, L_, 1, B))
        if sub == 1:
            # pad sublane dim to 8 for tiling friendliness
            pass
        r = call4d(a4, b4)
        return r.reshape(shape)

    # jit so the kernel traces once per shape and every call site reuses
    # the cached pjit (1500 inline retraces take minutes)
    return jax.jit(fn)


def _elemwise_call(kernel, interp, block_b):
    def call4d(a, b):
        N, L_, _s, B8 = a.shape
        bb = min(block_b // 8, B8)
        grid = (N, pl.cdiv(B8, bb))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, L_, 8, B8), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, L_, 8, bb), lambda s, g: (s, 0, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L_, 8, bb), lambda s, g: (s, 0, 0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, L_, 8, bb), lambda s, g: (s, 0, 0, g),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(a, b)

    def fn(a, b):
        a = jnp.asarray(a, jnp.uint32)
        b = jnp.asarray(b, jnp.uint32)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        a4 = a.reshape((-1, shape[-2], 8, shape[-1] // 8))
        b4 = b.reshape((-1, shape[-2], 8, shape[-1] // 8))
        return call4d(a4, b4).reshape(shape)

    return jax.jit(fn)


def make_add(spec: FieldSpec, block_b: int = 1024,
             interpret: bool | None = None):
    """Fused modular add kernel: a + b mod p over (..., L, B) uint32."""
    c = _consts(spec)
    L = c["L"]
    p_list = [int(x) for x in np.asarray(c["p_limbs"], np.uint32)]

    def kernel(a_ref, b_ref, o_ref):
        carry = jnp.zeros_like(a_ref[0, 0])
        limbs = []
        for i in range(L):
            t = a_ref[0, i] + b_ref[0, i] + carry
            limbs.append(t & MASK)
            carry = t >> LIMB_BITS
        _cond_sub_store(o_ref, limbs, carry, p_list, L)

    interp = (not on_tpu()) if interpret is None \
        else interpret
    return _elemwise_call(kernel, interp, block_b)


def make_sub(spec: FieldSpec, block_b: int = 1024,
             interpret: bool | None = None):
    """Fused modular subtract kernel: a - b mod p (adds p, cond-subtracts)."""
    c = _consts(spec)
    L = c["L"]
    p_list = [int(x) for x in np.asarray(c["p_limbs"], np.uint32)]

    def kernel(a_ref, b_ref, o_ref):
        carry = jnp.zeros_like(a_ref[0, 0], dtype=jnp.int32)
        limbs = []
        for i in range(L):
            v = (a_ref[0, i] + np.uint32(p_list[i])).astype(jnp.int32) \
                - b_ref[0, i].astype(jnp.int32) + carry
            limbs.append((v & MASK).astype(jnp.uint32))
            carry = v >> LIMB_BITS
        _cond_sub_store(o_ref, limbs, carry.astype(jnp.uint32), p_list, L)

    interp = (not on_tpu()) if interpret is None \
        else interpret
    return _elemwise_call(kernel, interp, block_b)


def _cond_sub_store(o_ref, limbs, top, p_list, L):
    """Write limbs (+ top overflow, value < 2p) canonically to o_ref."""
    borrow = jnp.zeros_like(limbs[0], dtype=jnp.int32)
    subbed = []
    for i in range(L):
        v = limbs[i].astype(jnp.int32) - np.int32(p_list[i]) - borrow
        subbed.append((v & MASK).astype(jnp.uint32))
        borrow = -(v >> LIMB_BITS)
    take = (top.astype(jnp.int32) - borrow) >= 0
    for i in range(L):
        o_ref[0, i] = jnp.where(take, subbed[i], limbs[i])
