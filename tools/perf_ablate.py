"""Time Poseidon2 interpreter under ablations (results WRONG, timing only)."""
import os, sys, time
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else ""
os.environ["CTPU_ABLATE"] = mode
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from circom_tpu.circuits.gen_poseidon import generate
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec

src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
cc = compile_source(src)
tape, _ = cc.build_tape()
spec = field_spec("bn128")
prog = WitnessProgram(tape, spec, unroll_threshold=0)
batch = 65536
rngn = np.random.RandomState(0)
arr = jax.device_put(
    rngn.randint(0, 1 << 14, (prog.n_inputs, prog.jf.L, batch))
    .astype(np.uint32))
run_fn = jax.jit(prog.jittable()).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
sync_fn = jax.jit(lambda o: o[:, 0, :].astype(jnp.uint32).sum()).lower(
    jax.ShapeDtypeStruct((prog.n_witness, prog.jf.L, batch),
                         jnp.uint32)).compile()
out = run_fn(arr); np.asarray(sync_fn(out))
t0 = time.time()
for _ in range(10):
    out = run_fn(arr)
np.asarray(sync_fn(out))
dt = (time.time() - t0) / 10
print(f"ablate='{mode}': {dt*1e3:.2f} ms -> {batch/dt:,.0f} wit/s")
