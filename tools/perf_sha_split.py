import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec
src = (open("circom_tpu/circuits/sha256.circom").read()
       + "\ncomponent main = Sha256Block();\n")
cc = compile_source(src)
tape, _ = cc.build_tape()
prog = WitnessProgram(tape, field_spec("bn128"), unroll_threshold=0,
                      mode="interp", input_ranges=cc.input_range_hints())
f = prog.fused
batch = 16384
L = f.L

def kernel_only(inputs):
    B8 = batch // 8
    x = inputs.reshape(inputs.shape[0], L, 8, B8)
    order_n = sorted(f.nin_of, key=f.nin_of.get)
    xs = x[np.asarray(order_n)]
    x_n = xs[:, 0].astype(jnp.int32)
    if L > 1:
        x_n = x_n | (xs[:, 1].astype(jnp.int32) << 16)
    x_w = jnp.zeros((1, L, 8, B8), jnp.uint32)
    flat, flat_n = f._exec_block(x_w, x_n, B8, f.lanes, False)
    return flat_n[:, :, 0, :1].sum()

rngn = np.random.RandomState(0)
arr = jax.device_put((rngn.randint(0, 2, (512, L, batch))).astype(np.uint32))
kfn = jax.jit(kernel_only).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
out = kfn(arr); np.asarray(out)
t0 = time.time()
for _ in range(5):
    out = kfn(arr)
np.asarray(out)
print(f"kernel-only: {(time.time()-t0)/5*1e3:.2f} ms")

rfn = jax.jit(f._run_mixed).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
nw, wd = rfn(arr)
sfn = jax.jit(lambda o: o.sum()).lower(
    jax.ShapeDtypeStruct(nw.shape, nw.dtype)).compile()
np.asarray(sfn(nw))
t0 = time.time()
for _ in range(5):
    nw, _ = rfn(arr)
np.asarray(sfn(nw))
print(f"full mixed : {(time.time()-t0)/5*1e3:.2f} ms")
