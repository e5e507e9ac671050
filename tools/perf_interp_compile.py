import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec
import circom_tpu.backend.interp as I
src = (open("circom_tpu/circuits/sha256.circom").read()
       + "\ncomponent main = Sha256Block();\n")
cc = compile_source(src)
tape, _ = cc.build_tape()
# cache-bust: nonstandard KN
orig = I.InterpreterProgram.__init__
def pi(self, dtape, spec, **kw):
    kw["chunk_emits_n"] = int(sys.argv[1]) if len(sys.argv) > 1 else 255
    orig(self, dtape, spec, **kw)
I.InterpreterProgram.__init__ = pi
prog = WitnessProgram(tape, field_spec("bn128"), unroll_threshold=0,
                      mode="interp", input_ranges=cc.input_range_hints())
f = prog.fused
print(f"steps={f.n_steps} chunks={f.n_chunks} calls={len(f.calls)} "
      f"KN={f.KN}", flush=True)
batch = 16384
L = f.L

def kernel_only(inputs):
    B8 = batch // 8
    x = inputs.reshape(inputs.shape[0], L, 8, B8)
    order_n = sorted(f.nin_of, key=f.nin_of.get)
    xs = x[np.asarray(order_n)]
    x_n = xs[:, 0].astype(jnp.int32)
    x_n = x_n | (xs[:, 1].astype(jnp.int32) << 16)
    x_w = jnp.zeros((1, L, 8, B8), jnp.uint32)
    flat, flat_n = f._exec_block(x_w, x_n, B8, f.lanes, False)
    return flat_n[:, :, 0, :1].sum()

t0 = time.time()
kfn = jax.jit(kernel_only).lower(
    jax.ShapeDtypeStruct((512, L, batch), jnp.uint32)).compile()
print(f"interp kernel compile: {time.time()-t0:.1f}s")

t0 = time.time()
low = jax.jit(f._run_mixed).lower(
    jax.ShapeDtypeStruct((512, L, batch), jnp.uint32))
print(f"run_mixed lower: {time.time()-t0:.1f}s")
t0 = time.time()
comp = low.compile()
print(f"run_mixed compile: {time.time()-t0:.1f}s")

rngn = np.random.RandomState(0)
arr = jax.device_put(rngn.randint(0, 2, (512, L, batch)).astype(np.uint32))
t0 = time.time()
o = kfn(arr); np.asarray(o)
print(f"interp kernel first exec: {time.time()-t0:.1f}s")
t0 = time.time()
nw, _ = comp(arr)
np.asarray(jax.jit(lambda x: x.sum())(nw))
print(f"run_mixed first exec: {time.time()-t0:.1f}s")
