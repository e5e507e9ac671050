"""Which kernel branch explodes Mosaic compile time?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

bb = 128
SALT = int(sys.argv[2]) if len(sys.argv) > 2 else 0
VARIANT = sys.argv[1]

def kern(tab_ref, x_ref, o_ref, rf):
    def stp(t, cy):
        ia = tab_ref[t]
        aux = tab_ref[t + 1]
        na = rf[ia]
        if VARIANT == "shru_cast":
            r = (na.astype(jnp.uint32) >> aux.astype(jnp.uint32)) \
                .astype(jnp.int32)
        elif VARIANT == "shru_lax":
            r = lax.shift_right_logical(
                na, jnp.broadcast_to(aux, na.shape))
        elif VARIANT == "shr_arith":
            r = na >> aux
        else:
            r = na + aux
        rf[tab_ref[t + 2]] = r + np.int32(SALT)
        return cy
    lax.fori_loop(0, 64, stp, 0)
    o_ref[0] = rf[0]

tab = np.arange(128, dtype=np.int32) % 4
x = jnp.ones((1, 8, 1024), jnp.int32)
t0 = time.time()
fn = jax.jit(lambda tb, xx: pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((1, 8, 1024), jnp.int32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1024 // bb,),
        in_specs=[pl.BlockSpec((1, 8, bb), lambda g, i: (0, 0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, bb), lambda g, i: (0, 0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 8, bb), jnp.int32)],
    ))(tb, xx)).lower(
        jax.ShapeDtypeStruct(tab.shape, jnp.int32),
        jax.ShapeDtypeStruct(x.shape, x.dtype)).compile()
print(f"{VARIANT}: compile {time.time()-t0:.1f}s")
