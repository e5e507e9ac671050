"""Isolate segmented-gather cell costs: empty body / DMA only / full."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, G, S, bb = 2827, 16, 8, 128
W = 25280
RC = 32
U = 2
n_cells = W // RC
rng = np.random.RandomState(0)
bank = jax.device_put(rng.randint(0, 2**31, (R, G, S, bb)).astype(np.int32))
uniq = rng.randint(0, R, (n_cells, U)).astype(np.int32)
jm = rng.randint(0, U, W).astype(np.int32)
sh = (rng.randint(0, 33, W) - 1).astype(np.int32)

def run(label, kern, scratch_shapes):
    def call(u, j, s, b):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((W, S, G, bb), jnp.int32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_cells,),
                in_specs=[pl.BlockSpec(
                    memory_space=pltpu.MemorySpace.ANY)],
                out_specs=pl.BlockSpec((RC, S, G, bb),
                                       lambda c, *_: (c, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=scratch_shapes,
            ))(u, j, s, b)
        return out.ravel()[::65536].sum()
    fn = jax.jit(call)
    c = fn.lower(*[jax.ShapeDtypeStruct(x.shape, x.dtype)
                   for x in (uniq, jm, sh, bank)]).compile()
    o = c(uniq, jm, sh, bank); np.asarray(o)
    t0 = time.time()
    for _ in range(10):
        o = c(uniq, jm, sh, bank)
    np.asarray(o)
    dt = (time.time() - t0) / 10
    print(f"{label}: {dt*1e3:.2f} ms ({dt/n_cells*1e6:.1f} us/cell)")

def k_empty(u_ref, jm_ref, sh_ref, bank_ref, out_ref):
    out_ref[0] = jnp.zeros((S, G, bb), jnp.int32)

run("empty body       ", k_empty, [])

def k_dma(u_ref, jm_ref, sh_ref, bank_ref, out_ref, scratch, sem):
    c = pl.program_id(0)
    for u in range(U):
        pltpu.make_async_copy(bank_ref.at[u_ref[c, u]],
                              scratch.at[u], sem.at[u]).start()
    for u in range(U):
        pltpu.make_async_copy(bank_ref.at[u_ref[c, u]],
                              scratch.at[u], sem.at[u]).wait()
    out_ref[0] = scratch[0].transpose(1, 0, 2)

run("dma only         ", k_dma,
    [pltpu.VMEM((U, G, S, bb), jnp.int32), pltpu.SemaphoreType.DMA((U,))])

def k_full(u_ref, jm_ref, sh_ref, bank_ref, out_ref, scratch, tr, sem):
    c = pl.program_id(0)
    for u in range(U):
        pltpu.make_async_copy(bank_ref.at[u_ref[c, u]],
                              scratch.at[u], sem.at[u]).start()
    for u in range(U):
        pltpu.make_async_copy(bank_ref.at[u_ref[c, u]],
                              scratch.at[u], sem.at[u]).wait()
    for u in range(U):
        for g in range(G):
            tr[u, :, g, :] = scratch[u, g]
    for j in range(RC):
        s = sh_ref[c * RC + j]
        su = jnp.maximum(s, 0).astype(jnp.uint32)
        v = tr[jm_ref[c * RC + j]]
        b = ((v.astype(jnp.uint32) >> su) & 1).astype(jnp.int32)
        out_ref[j] = jnp.where(s < 0, v, b)

run("full (dma+unpack)", k_full,
    [pltpu.VMEM((U, G, S, bb), jnp.int32),
     pltpu.VMEM((U, S, G, bb), jnp.int32),
     pltpu.SemaphoreType.DMA((U,))])
