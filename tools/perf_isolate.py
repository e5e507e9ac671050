"""Isolate interpreter overheads: dynamic indexing vs loop/switch."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
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
N_STEPS = 32
N_REGS = 12

# instruction table: random reg operands
rng = np.random.RandomState(3)
tab = np.zeros((N_STEPS, 3), np.int32)
tab[:, 0] = rng.randint(0, N_REGS, N_STEPS)
tab[:, 1] = rng.randint(0, N_REGS, N_STEPS)
tab[:, 2] = rng.randint(0, N_REGS, N_STEPS)

def bench(fn, args, label, n_ops):
    t0 = time.time()
    out = fn(*args); jax.block_until_ready(out)
    comp = time.time() - t0
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.3f} ms/call -> "
          f"{dt/(n_ops*B8*8)*1e9:.3f} ns/mul/wit (compile {comp:.0f}s)")

def common_specs():
    return dict(
        out_shape=jax.ShapeDtypeStruct((1, L, 8, B8), jnp.uint32),
        grid=(B8 // bb,),
        in_specs=[
            pl.BlockSpec((N_STEPS, 3), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N_REGS, L, 8, bb), jnp.uint32)],
    )

def init_rf(rf, a_ref):
    for k in range(N_REGS):
        for i in range(L):
            rf[k, i] = a_ref[0, i] + np.uint32(k)

# --- variant A: dynamic operands+dst, python-unrolled steps ----------
def kA(tab_ref, a_ref, o_ref, rf):
    zero = jnp.zeros((8, bb), jnp.uint32)
    init_rf(rf, a_ref)
    for t in range(N_STEPS):
        ia, ib, dst = tab_ref[t, 0], tab_ref[t, 1], tab_ref[t, 2]
        def rd(k, i):
            return rf[ia, i] if k == 0 else rf[ib, i]
        rows = em.emit_mul(rd, zero)
        res = jnp.stack([jnp.broadcast_to(r, (8, bb)) for r in rows])
        rf[dst] = res
    for i in range(L):
        o_ref[0, i] = rf[0, i]

# --- variant B: dynamic operands+dst inside fori_loop (table-driven) -
def kB(tab_ref, a_ref, o_ref, rf):
    zero = jnp.zeros((8, bb), jnp.uint32)
    init_rf(rf, a_ref)
    def stp(t, cy):
        ia, ib, dst = tab_ref[t, 0], tab_ref[t, 1], tab_ref[t, 2]
        def rd(k, i):
            return rf[ia, i] if k == 0 else rf[ib, i]
        rows = em.emit_mul(rd, zero)
        res = jnp.stack([jnp.broadcast_to(r, (8, bb)) for r in rows])
        rf[dst] = res
        return cy
    lax.fori_loop(0, N_STEPS, stp, 0)
    for i in range(L):
        o_ref[0, i] = rf[0, i]

# --- variant C: fori_loop + 8-way switch (interpreter-like) ----------
def kC(tab_ref, a_ref, o_ref, rf):
    zero = jnp.zeros((8, bb), jnp.uint32)
    init_rf(rf, a_ref)
    def stp(t, cy):
        ia, ib, dst = tab_ref[t, 0], tab_ref[t, 1], tab_ref[t, 2]
        def rd(k, i):
            return rf[ia, i] if k == 0 else rf[ib, i]
        def do_mul():
            rows = em.emit_mul(rd, zero)
            res = jnp.stack([jnp.broadcast_to(r, (8, bb)) for r in rows])
            rf[dst] = res
        def do_add():
            rows = em.emit("add", rd, None, zero)
            res = jnp.stack([jnp.broadcast_to(r, (8, bb)) for r in rows])
            rf[dst] = res
        branches = [do_mul, do_add] * 4
        lax.switch(tab_ref[t, 0] % 1, [lambda: lax.fori_loop(t, t+1, lambda q, c: (stp2(q), c)[1], 0)]) if False else None
        lax.switch((ia * 0), branches)
        return cy
    lax.fori_loop(0, N_STEPS, stp, 0)
    for i in range(L):
        o_ref[0, i] = rf[0, i]

def mk(kern):
    return jax.jit(lambda tb, a: pl.pallas_call(kern, **common_specs())(tb, a))

va = int_to_limbs(123456789, L)
an = np.broadcast_to(np.asarray(va, np.uint32)[None, :, None, None],
                     (1, L, 8, B8)).copy()
a = jax.device_put(an)
tb = jax.device_put(tab)

bench(mk(kA), (tb, a), "A unrolled+dynamic-regs", N_STEPS)
bench(mk(kB), (tb, a), "B fori+dynamic-regs    ", N_STEPS)
bench(mk(kC), (tb, a), "C fori+switch8         ", N_STEPS)
