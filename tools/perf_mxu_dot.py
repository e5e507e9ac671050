"""MXU prototype: dot3_c (3-term constant-coeff lincomb + lazy
Montgomery reduction) with the product convolution as a bf16 matmul.

VPU version: 3 x (L x L byte... 16-bit limb) convolutions accumulated
into 2L+1 16-bit columns (current interp dot()).
MXU version: split limbs into bytes (32 bf16 rows/operand, 96 rows
total), multiply by a constant (2*2L+1=65, 96) byte-weight matrix on
the MXU (f32 accumulate is exact: products < 2^16, sums of 96 < 2^23),
fold byte columns back to 16-bit columns, Montgomery-reduce once.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limb_emit import LimbEmitter, MASK
from circom_tpu.ops.limbs import int_to_limbs, limbs_to_int

spec = field_spec("bn128")
em = LimbEmitter(spec)
L = spec.n_limbs
bb = 256
B8 = 8192
N_DOTS = 32  # independent dot3 steps per kernel invocation

rng = np.random.RandomState(3)
p = spec.p
import random as pyrand
prng = pyrand.Random(3)
coeffs = [[prng.randrange(1, p) for _ in range(3)] for _ in range(N_DOTS)]
KR = [prng.randrange(p) for _ in range(N_DOTS)]

# --- VPU reference kernel -------------------------------------------
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

# --- MXU kernel ------------------------------------------------------
# constant matrix per dot: rows = 65 byte columns, cols = 96 operand
# byte pieces; entry [2k+pb, 32*t + 2*i + pa] = byte pb' of c_j ...
def mxu_mats():
    mats = []
    for d in range(N_DOTS):
        M = np.zeros((2 * (2 * L + 1), 96), np.float32)
        for t_i, cv in enumerate(coeffs[d]):
            climbs = [int(x) for x in int_to_limbs(cv, L)]
            for i in range(L):          # operand limb index
                for pa in range(2):     # operand byte within limb
                    col = 32 * t_i + 2 * i + pa
                    for j in range(L):
                        for pc in range(2):
                            byte = (climbs[j] >> (8 * pc)) & 0xff
                            if byte:
                                # product byte weight 8*(2i+pa+2j+pc)
                                M[2 * (i + j) + pa + pc, col] += byte
        mats.append(M)
    # fold rows beyond 2*(2L+1)-1? max row index = 2*(2L-2)+2 fits
    return np.stack(mats)  # (N_DOTS, 66ish, 96)

MATS = mxu_mats().astype(np.float32)
NROW = MATS.shape[1]

def mk_mxu():
    def kern(a_ref, b_ref, c_ref, m_ref, o_ref):
        zero = jnp.zeros((8, bb), jnp.uint32)
        # byte pieces of the three operands: (96, 8, bb) bf16
        pieces = []
        for ref in (a_ref, b_ref, c_ref):
            for i in range(L):
                v = ref[0, i]
                pieces.append((v & 0xff).astype(jnp.int32)
                              .astype(jnp.bfloat16))
                pieces.append((v >> 8).astype(jnp.int32)
                              .astype(jnp.bfloat16))
        P = jnp.stack(pieces)  # (96, 8, bb)
        acc = [zero] * L
        for d in range(N_DOTS):
            B = lax.dot_general(
                m_ref[d], P,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (NROW, 8, bb)
            Bu = B.astype(jnp.int32).astype(jnp.uint32)
            # fold byte columns to 16-bit columns and feed the REDC
            # DIRECTLY (r5 fix: the carry pre-normalization was the
            # correctness bug; mont_reduce_rows accepts cols < ~2^29)
            cols = []
            for k in range(2 * L + 1):
                lo = Bu[2 * k]
                hi = Bu[2 * k + 1] if 2 * k + 1 < NROW else zero
                cols.append(lo + (hi << 8))
            kr = int_to_limbs((KR[d] * (1 << (16 * L))) % p, L)
            for j in range(L):
                cols[j] = cols[j] + np.uint32(int(kr[j]))
            rows = em.mont_reduce_rows(cols, zero)
            acc = [acc[i] ^ rows[i] for i in range(L)]
        for i in range(L):
            o_ref[0, i] = acc[i]
    return kern

def bench(label, kern, with_mats=False):
    in_specs = [pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                             memory_space=pltpu.VMEM)] * 3
    if with_mats:
        in_specs.append(pl.BlockSpec(
            (N_DOTS, MATS.shape[1], 96), lambda g: (0, 0, 0),
            memory_space=pltpu.VMEM))
    fn = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, L, 8, B8), jnp.uint32),
        grid=(B8 // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                               memory_space=pltpu.VMEM),
    )(*a))
    args = []
    for s in (1, 2, 3):
        an = np.zeros((1, L, 8, B8), np.uint32)
        vals = rng.randint(0, 1 << 16, (L, 8, B8))
        an[0] = vals
        args.append(jax.device_put(an))
    if with_mats:
        args.append(jax.device_put(MATS.astype(jnp.bfloat16)))
    lo = fn.lower(*[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in args])
    t0 = time.time()
    c = lo.compile()
    o = c(*args)
    s = np.asarray(jax.jit(lambda x: x.astype(jnp.uint32).sum())(o))
    print(f"{label}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(10):
        o = c(*args)
    np.asarray(jax.jit(lambda x: x.astype(jnp.uint32).sum())(o))
    dt = (time.time() - t0) / 10
    per = dt / (N_DOTS * B8 * 8) * 1e9
    print(f"{label}: {dt*1e3:.2f} ms -> {per:.3f} ns/dot3/wit")
    return np.asarray(o)

o1 = bench("VPU dot3", mk_vpu())
o2 = bench("MXU dot3", mk_mxu(), with_mats=True)
print("outputs equal:", bool((o1 == o2).all()))
