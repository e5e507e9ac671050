"""Careful speed-of-light montmul chain measurement."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limb_emit import LimbEmitter
from circom_tpu.ops.limbs import int_to_limbs

spec = field_spec("bn128")
em = LimbEmitter(spec)
L = spec.n_limbs
bb = 256
B8 = 8192

def make(n_muls):
    def kernel(a_ref, b_ref, o_ref):
        zero = jnp.zeros((8, bb), jnp.uint32)
        rows_a = [a_ref[0, i] for i in range(L)]
        rows_b = [b_ref[0, i] for i in range(L)]
        for _ in range(n_muls):
            def rd(k, i, ra=rows_a, rb=rows_b):
                return ra[i] if k == 0 else rb[i]
            rows_a = em.emit_mul(rd, zero)
        for i in range(L):
            o_ref[0, i] = rows_a[i]
    return jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, L, 8, B8), jnp.uint32),
        grid=(B8 // bb,),
        in_specs=[pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                               memory_space=pltpu.VMEM),
    )(a, b))

import random
rng = random.Random(7)
p = spec.p
an = np.zeros((1, L, 8, B8), np.uint32)
bn = np.zeros((1, L, 8, B8), np.uint32)
# fill a few distinct columns with random field elems (cheap host side)
va = int_to_limbs(rng.randrange(p), L); vb = int_to_limbs(rng.randrange(p), L)
an[0, :, :, :] = np.asarray(va, np.uint32)[:, None, None]
bn[0, :, :, :] = np.asarray(vb, np.uint32)[:, None, None]
# add lane jitter so columns differ
an[0, 0] ^= np.arange(8*B8, dtype=np.uint32).reshape(8, B8) & 0x7fff
a = jax.device_put(an); b = jax.device_put(bn)

for n_muls in (8, 32):
    t0 = time.time()
    fn = make(n_muls)
    out = fn(a, b); jax.block_until_ready(out)
    print(f"N={n_muls}: compile+first {time.time()-t0:.1f}s")
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = fn(a, b)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    per = dt / (n_muls * B8 * 8) * 1e9
    print(f"N={n_muls}: {dt*1e3:.3f} ms/call -> {per:.3f} ns/mul/wit "
          f"(model SoL 0.432)")
