"""Measure raw Pallas/Mosaic control-flow costs: empty fori iterations,
dynamic-bound fori, and lax.switch dispatch with k branches."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B8 = 8192
bb = 256
G = B8 // bb  # 32 grid cells

def run(label, kernel, n_units, extra_in=()):
    in_specs = [pl.BlockSpec((1, 8, bb), lambda g, *_: (0, 0, g),
                             memory_space=pltpu.VMEM)]
    args = [jnp.ones((1, 8, B8), jnp.uint32)]
    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 8, B8), jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(extra_in),
            grid=(G,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8, bb), lambda g, *_: (0, 0, g),
                                   memory_space=pltpu.VMEM),
        ),
    )(*a))
    args = list(extra_in) + args
    out = fn(*args); jax.block_until_ready(out)
    reps = 30
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e6:.1f} us/call -> {dt/G/n_units*1e9:.0f} ns/unit "
          f"({n_units} units x {G} cells)")

N = 416

# 1. static-bound empty fori
def k1(x_ref, o_ref):
    def body(t, c):
        return c + t
    r = lax.fori_loop(0, N, body, 0)
    o_ref[0] = x_ref[0] + r.astype(jnp.uint32)
run("empty fori (static bound)", k1, N)

# 2. dynamic-bound empty fori (bounds from SMEM)
bounds = np.asarray([0, N], np.int32)
def k2(b_ref, x_ref, o_ref):
    def body(t, c):
        return c + t
    r = lax.fori_loop(b_ref[0], b_ref[1], body, 0)
    o_ref[0] = x_ref[0] + r.astype(jnp.uint32)
run("empty fori (dyn bound)  ", k2, N, (bounds,))

# 3. fori over RUNS, each: 5-way switch on SMEM opcode, branches do
#    tiny vector work (interpreter-shaped, 131 runs)
NR = 131
ops = np.asarray(np.arange(NR) % 5, np.int32)
rs = np.asarray(np.linspace(0, N, NR + 1).astype(np.int32))
def k3(op_ref, rs_ref, x_ref, o_ref):
    def runb(r, c):
        def stepper(k):
            def stp(t, cy):
                return cy + t * (k + 1)
            def go():
                return lax.fori_loop(rs_ref[r], rs_ref[r + 1], stp, 0)
            return go
        v = lax.switch(op_ref[r], [stepper(k) for k in range(5)])
        return c + v
    r = lax.fori_loop(0, NR, runb, 0)
    o_ref[0] = x_ref[0] + r.astype(jnp.uint32)
run("runs+switch5 (empty)    ", k3, NR, (ops, rs))

# 4. same but switch branches contain a vector op on the out block
def k4(op_ref, rs_ref, x_ref, o_ref):
    def runb(r, c):
        def stepper(k):
            def stp(t, cy):
                o_ref[0] = o_ref[0] + np.uint32(k)
                return cy
            def go():
                return lax.fori_loop(rs_ref[r], rs_ref[r + 1], stp, 0)
            return go
        v = lax.switch(op_ref[r], [stepper(k) for k in range(5)])
        return c + v
    r = lax.fori_loop(0, NR, runb, 0)
    o_ref[0] = o_ref[0] + x_ref[0] + r.astype(jnp.uint32)
run("runs+switch5 (vec body) ", k4, NR, (ops, rs))
