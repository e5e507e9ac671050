"""Microbench witness-gather formulations, PROPER axon sync."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

G, R, L, S, bb = 32, 339, 16, 8, 256
W = 307
rng = np.random.RandomState(0)
big = jax.device_put(rng.randint(0, 2**31, (G, R, L, S, bb)).astype(np.uint32))
idx = jnp.asarray(rng.randint(0, R, W).astype(np.int32))

def timeit(label, fn, *a):
    # fold a scalar reduction into the jit so sync is real
    red = jax.jit(lambda *x: fn(*x).ravel()[::65536].astype(jnp.uint32).sum())
    c = red.lower(*[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in a]).compile()
    o = c(*a); np.asarray(o)
    t0 = time.time()
    for _ in range(10):
        o = c(*a)
    np.asarray(o)
    print(f"{label}: {(time.time()-t0)/10*1e3:.2f} ms")

timeit("A take ax1 + moveaxis(0,3) + reshape",
       lambda b, i: jnp.moveaxis(jnp.take(b, i, axis=1), 0, 3)
       .reshape(W, L, S * G * bb), big, idx)
timeit("B take ax1 only                    ",
       lambda b, i: jnp.take(b, i, axis=1), big, idx)
timeit("C moveaxis(0,3)+reshape only       ",
       lambda b, i: jnp.moveaxis(b[:, :W], 0, 3).reshape(W, L, S*G*bb),
       big, idx)
timeit("D old-layout take: (R,L,S,G*bb) ax0",
       lambda b, i: jnp.take(b.reshape(G*R, L, S, bb)[:R*1], i, axis=0),
       big, idx)
