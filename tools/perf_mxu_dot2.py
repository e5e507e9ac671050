"""MXU dot3_c, take 2 (r5): fix the two structural problems of
perf_mxu_dot.py and get a CLEAN measured answer on whether the idle
MXU can accelerate the constant-coefficient lincomb convolutions.

Changes vs perf_mxu_dot.py:
* the operand byte-piece tensor is reshaped to 2D (96, 8*bb) so the
  contraction is a plain (M,K)x(K,N) matmul Mosaic can place on the
  MXU (the rank-3 rhs of take 1 likely lowered to VPU ops);
* all N_DOTS constant matrices stack into ONE (N_DOTS*NROW, 96)
  lhs -> a single 2112x96x2048 matmul per grid cell instead of 32
  tiny 66x96 ones (MXU needs M large to amortize).

Exactness argument (unchanged): matrix entries are SINGLE bytes
(unique (j, pc) per cell: row = 2(i+j)+pa+pc with pa fixed by the
column and 2j even forces pc parity), so bf16 holds them exactly;
products are <= 255*255 and the 96-deep f32 accumulation stays under
2^23 < 2^24.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from circom_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limb_emit import LimbEmitter, MASK
from circom_tpu.ops.limbs import int_to_limbs

spec = field_spec("bn128")
em = LimbEmitter(spec)
L = spec.n_limbs
bb = 256
B8 = 8192
N_DOTS = 16  # (2112,2048) f32 = 17MB blew the 16MB VMEM; 16 dots -> 8.6MB

rng = np.random.RandomState(3)
p = spec.p
import random as pyrand

prng = pyrand.Random(3)
coeffs = [[prng.randrange(1, p) for _ in range(3)]
          for _ in range(N_DOTS)]
KR = [prng.randrange(p) for _ in range(N_DOTS)]


def mk_vpu():
    def kern(a_ref, b_ref, c_ref, o_ref):
        zero = jnp.zeros((8, bb), jnp.uint32)
        acc = [zero] * L
        for d in range(N_DOTS):
            cols = [zero] * (2 * L + 1)
            for t_i, (ref, cv) in enumerate(
                    zip((a_ref, b_ref, c_ref), coeffs[d])):
                cs = [np.uint32(x) for x in int_to_limbs(cv, L)]
                for i in range(L):
                    xi = ref[0, i]
                    for j in range(L):
                        if not int(cs[j]):
                            continue
                        prod = xi * cs[j]
                        cols[i + j] = cols[i + j] + (prod & MASK)
                        cols[i + j + 1] = cols[i + j + 1] \
                            + (prod >> 16)
            kr = int_to_limbs((KR[d] * (1 << (16 * L))) % p, L)
            for j in range(L):
                cols[j] = cols[j] + np.uint32(int(kr[j]))
            rows = em.mont_reduce_rows(cols, zero)
            acc = [acc[i] ^ rows[i] for i in range(L)]
        for i in range(L):
            o_ref[0, i] = acc[i]
    return kern


def mxu_mats():
    mats = []
    for d in range(N_DOTS):
        M = np.zeros((2 * (2 * L + 1), 96), np.float32)
        for t_i, cv in enumerate(coeffs[d]):
            climbs = [int(x) for x in int_to_limbs(cv, L)]
            for i in range(L):
                for pa in range(2):
                    col = 32 * t_i + 2 * i + pa
                    for j in range(L):
                        for pc in range(2):
                            byte = (climbs[j] >> (8 * pc)) & 0xff
                            if byte:
                                M[2 * (i + j) + pa + pc, col] += byte
        assert (M <= 255).all(), "matrix entry exceeds one byte"
        mats.append(M)
    return np.stack(mats)


MATS = mxu_mats()
NROW = MATS.shape[1]
MBIG = MATS.reshape(N_DOTS * NROW, 96).astype(np.float32)


def mk_mxu():
    # flat-batch layout (1, L, 1, 8*bb): Mosaic cannot shape-cast
    # (8*bb,) -> (8, bb), so every per-limb tile is a (1, 8*bb) 2D
    # vector and the matmul operand collapses (96, 1, 8bb)->(96, 8bb)
    def kern(a_ref, b_ref, c_ref, m_ref, o_ref):
        zero = jnp.zeros((1, 8 * bb), jnp.uint32)
        pieces = []
        for ref in (a_ref, b_ref, c_ref):
            for i in range(L):
                v = ref[0, i][None, :]        # (1, 8*bb)
                pieces.append((v & 0xff).astype(jnp.int32)
                              .astype(jnp.bfloat16))
                pieces.append((v >> 8).astype(jnp.int32)
                              .astype(jnp.bfloat16))
        P = jnp.concatenate(pieces, axis=0)         # (96, 8*bb)
        B = lax.dot_general(
            m_ref[...], P,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (N_DOTS*NROW, 8bb)
        acc = [zero] * L

        def bu(r):
            return B[r][None, :].astype(jnp.int32).astype(jnp.uint32)
        for d in range(N_DOTS):
            # byte columns fold straight into the 16-bit column set —
            # NO carry normalization: mont_reduce_rows tolerates
            # columns up to ~2^29 (uint32 headroom: cols + L*2^16 +
            # carry < 2^32), and the take-1 carry chain was the
            # correctness bug (normalizing before REDC disagreed with
            # the lazy-column form the reducer expects)
            cols = []
            for k in range(2 * L + 1):
                lo = bu(d * NROW + 2 * k)
                hi = (bu(d * NROW + 2 * k + 1)
                      if 2 * k + 1 < NROW else zero)
                cols.append(lo + (hi << 8))
            kr = int_to_limbs((KR[d] * (1 << (16 * L))) % p, L)
            for j in range(L):
                cols[j] = cols[j] + np.uint32(int(kr[j]))
            rows = em.mont_reduce_rows(cols, zero)
            acc = [acc[i] ^ rows[i] for i in range(L)]
        for i in range(L):
            o_ref[0, i] = acc[i][0]
    return kern


ARGS_RAW = [rng.randint(0, 1 << 16, (L, 8, B8)).astype(np.uint32)
            for _ in range(3)]


def flatten_blocks(a):
    """(L, 8, B8) -> (L, 8*B8) with per-block (8, bb) slabs contiguous
    (the flat layout the MXU kernel's block specs use)."""
    out = np.zeros((a.shape[0], 8 * B8), np.uint32)
    for g in range(B8 // bb):
        out[:, g * 8 * bb:(g + 1) * 8 * bb] = \
            a[:, :, g * bb:(g + 1) * bb].reshape(a.shape[0], 8 * bb)
    return out


def unflatten_blocks(a):
    out = np.zeros((a.shape[0], 8, B8), np.uint32)
    for g in range(B8 // bb):
        out[:, :, g * bb:(g + 1) * bb] = \
            a[:, g * 8 * bb:(g + 1) * 8 * bb].reshape(a.shape[0], 8, bb)
    return out


def bench(label, kern, with_mats=False):
    if with_mats:
        in_specs = [pl.BlockSpec((1, L, 8 * bb),
                                 lambda g: (0, 0, g),
                                 memory_space=pltpu.VMEM)] * 3
        in_specs.append(pl.BlockSpec(
            (N_DOTS * NROW, 96), lambda g: (0, 0),
            memory_space=pltpu.VMEM))
        out_shape = jax.ShapeDtypeStruct((1, L, B8 * 8), jnp.uint32)
        out_specs = pl.BlockSpec((1, L, 8 * bb), lambda g: (0, 0, g),
                                 memory_space=pltpu.VMEM)
        args = [jax.device_put(flatten_blocks(a)[None])
                for a in ARGS_RAW]
        args.append(jax.device_put(MBIG.astype(jnp.bfloat16)))
    else:
        in_specs = [pl.BlockSpec((1, L, 8, bb),
                                 lambda g: (0, 0, 0, g),
                                 memory_space=pltpu.VMEM)] * 3
        out_shape = jax.ShapeDtypeStruct((1, L, 8, B8), jnp.uint32)
        out_specs = pl.BlockSpec((1, L, 8, bb),
                                 lambda g: (0, 0, 0, g),
                                 memory_space=pltpu.VMEM)
        args = [jax.device_put(a[None]) for a in ARGS_RAW]
    fn = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(B8 // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
    )(*a))
    lo = fn.lower(*[jax.ShapeDtypeStruct(x.shape, x.dtype)
                    for x in args])
    t0 = time.time()
    c = lo.compile()
    o = c(*args)
    np.asarray(jax.jit(lambda x: x.astype(jnp.uint32).sum())(o))
    print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(10):
        o = c(*args)
    np.asarray(jax.jit(lambda x: x.astype(jnp.uint32).sum())(o))
    dt = (time.time() - t0) / 10
    per = dt / (N_DOTS * B8 * 8) * 1e9
    print(f"{label}: {dt*1e3:.2f} ms -> {per:.3f} ns/dot3/wit",
          flush=True)
    o = np.asarray(o)
    if with_mats:
        o = unflatten_blocks(o[0])[None]
    return o


o1 = bench("VPU dot3", mk_vpu())
o2 = bench("MXU dot3 (batched 2D)", mk_mxu(), with_mats=True)
eq = bool((o1 == o2).all())
print("outputs equal:", eq)
if not eq:
    d = np.argwhere(o1 != o2)
    print("first mismatches:", d[:4].tolist(),
          "n =", d.shape[0])
