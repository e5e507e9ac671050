"""Decompose Poseidon2 interpreter plan + speed-of-light microbench."""
import sys, time, collections
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from circom_tpu.circuits.gen_poseidon import generate
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limb_emit import LimbEmitter

src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
cc = compile_source(src)
tape, _ = cc.build_tape()
spec = field_spec("bn128")
prog = WitnessProgram(tape, spec, unroll_threshold=0)
f = prog.fused
names = list(f.opset_n) + list(f.opset_w)
opcount = collections.Counter()
for t in range(f.n_steps):
    opcount[names[int(f.table[t, 0])]] += 1
print("step composition:", dict(opcount))
# run length histogram per opcode
runs = collections.defaultdict(list)
for r in range(f.n_runs):
    op = names[int(f.r_op[r])]
    runs[op].append(int(f.r_s0[r+1]) - int(f.r_s0[r]))
for op, ls in sorted(runs.items()):
    print(f"  {op}: {len(ls)} runs, lens {sorted(ls, reverse=True)[:12]}")

# --- speed-of-light: chained montmuls with static addressing ---------
em = LimbEmitter(spec)
L = spec.n_limbs
N_MULS = 64
bb = 256

def kernel(a_ref, b_ref, o_ref):
    zero = jnp.zeros((8, bb), jnp.uint32)
    rows_a = [a_ref[0, i] for i in range(L)]
    rows_b = [b_ref[0, i] for i in range(L)]
    for _ in range(N_MULS):
        def rd(k, i, ra=rows_a, rb=rows_b):
            return ra[i] if k == 0 else rb[i]
        rows_a = em.emit_mul(rd, zero)
    for i in range(L):
        o_ref[0, i] = rows_a[i]

B8 = 8192  # = 65536/8
t0 = time.time()
fn = jax.jit(lambda a, b: pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((1, L, 8, B8), jnp.uint32),
    grid=(B8 // bb,),
    in_specs=[pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                           memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec((1, L, 8, bb), lambda g: (0, 0, 0, g),
                           memory_space=pltpu.VMEM),
)(a, b))
a = jnp.ones((1, L, 8, B8), jnp.uint32)
b = jnp.ones((1, L, 8, B8), jnp.uint32) * 3
out = fn(a, b); jax.block_until_ready(out)
print(f"mulchain compile {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(10):
    out = fn(a, b)
jax.block_until_ready(out)
dt = (time.time() - t0) / 10
n_mul_total = N_MULS * B8 * 8  # muls performed (per witness-lane)
print(f"static mul chain: {dt*1e3:.2f} ms for {N_MULS} muls x 65536 lanes "
      f"-> {dt*1e9/(N_MULS*65536):.2f} ns/mul/wit; "
      f"implied mul-only wit/s for ~240 muls: {1/(dt/ (N_MULS*65536) * 240):,.0f}")
# model: 2656 instrs/mul/witness-tile-lane /1024 = 2.59 instr/wit; at 6e9 -> 0.432ns
print(f"model speed-of-light: {2656/1024/6e9*1e9:.3f} ns/mul/wit")
