"""Quick Poseidon2/bn128 perf probe on the real TPU (no CPU baseline)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from circom_tpu.circuits.gen_poseidon import generate
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limbs import ints_to_limbs

t0 = time.time()
src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
cc = compile_source(src)
tape, _ = cc.build_tape()
spec = field_spec("bn128")
prog = WitnessProgram(tape, spec, unroll_threshold=0)
f = prog.fused
print(f"compile {time.time()-t0:.2f}s steps={f.n_steps} runs={f.n_runs} "
      f"nregs={f.n_regs} lanes={f.lanes} chunks={f.n_chunks} "
      f"mont_rows={f.n_mont_rows}", file=sys.stderr)

import random
rng = random.Random(1234)
p = spec.p
batch = 65536
cols = [[rng.randrange(p) for _ in range(batch)] for _ in range(prog.n_inputs)]
arr = jax.device_put(prog.encode_inputs(cols))
expect = cc.witness_host({"inputs": [cols[0][0], cols[1][0]]})
exp_dev = jax.device_put(np.asarray(ints_to_limbs(expect, prog.jf.L)))
jax.block_until_ready(arr)

run_fn = jax.jit(prog.jittable()).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
out_aval = jax.ShapeDtypeStruct((prog.n_witness, prog.jf.L, batch), jnp.uint32)
check_fn = jax.jit(lambda o, e: (o[:, :, 0] == e).all()).lower(
    out_aval, jax.ShapeDtypeStruct(exp_dev.shape, exp_dev.dtype)).compile()
sync_fn = jax.jit(lambda o: o[:, 0, :].astype(jnp.uint32).sum()).lower(
    out_aval).compile()

t0 = time.time()
out = run_fn(arr)
np.asarray(sync_fn(out))
print(f"first run {time.time()-t0:.2f}s", file=sys.stderr)
assert bool(check_fn(out, exp_dev)), "witness mismatch"
for _ in range(2):
    t0 = time.time()
    for _ in range(10):
        out = run_fn(arr)
    np.asarray(sync_fn(out))
    dt = (time.time() - t0) / 10
    print(f"batch {batch}: {dt*1e3:.2f} ms -> {batch/dt:,.0f} wit/s")
