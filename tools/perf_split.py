"""Split timing: interpreter kernel alone vs witness gather."""
import os, sys, time
import numpy as np
os.environ["CTPU_ABLATE"] = sys.argv[1] if len(sys.argv) > 1 else ""
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from circom_tpu.circuits.gen_poseidon import generate
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.jfield import on_tpu

src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
cc = compile_source(src)
tape, _ = cc.build_tape()
spec = field_spec("bn128")
prog = WitnessProgram(tape, spec, unroll_threshold=0)
f = prog.fused
batch = 65536
rngn = np.random.RandomState(0)
arr = jax.device_put(
    rngn.randint(0, 1 << 14, (prog.n_inputs, f.L, batch)).astype(np.uint32))

L = f.L
def kernel_only(inputs):
    B8 = batch // 8
    x = inputs.reshape(inputs.shape[0], L, 8, B8)
    order_w = sorted(f.win_of, key=f.win_of.get)
    x_w = x[np.asarray(order_w)]
    x_n = jnp.zeros((1, 8, B8), jnp.int32)
    flat, flat_n = f._exec_block(x_w, x_n, B8, f.lanes, False)
    return flat[:, :, 0, 0, :1].astype(jnp.uint32).sum()

kfn = jax.jit(kernel_only).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
out = kfn(arr); np.asarray(out)
t0 = time.time()
for _ in range(10):
    out = kfn(arr)
np.asarray(out)
print(f"kernel-only: {(time.time()-t0)/10*1e3:.2f} ms")

rfn = jax.jit(f._run).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
o2 = rfn(arr); jax.block_until_ready(o2)
t0 = time.time()
for _ in range(10):
    o2 = rfn(arr)
jax.block_until_ready(o2)
print(f"full _run  : {(time.time()-t0)/10*1e3:.2f} ms")
