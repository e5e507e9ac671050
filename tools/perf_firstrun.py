"""Where does the first-run (device-load/Mosaic) time go?

Times AOT .compile() and the FIRST execution separately for the
Poseidon2 interpreter program under a CTPU_ABLATE mode.  r5 finding:
with the persistent XLA cache warm, .compile() is instant but the
first execution still pays 79-265s through the axon relay — the
Mosaic payload appears to be (re)compiled server-side at program load,
uncached, with heavy variance.  Usage:

    python tools/perf_firstrun.py [ablate-mode] [batch]
"""
import os
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else ""
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
os.environ["CTPU_ABLATE"] = mode
sys.path.insert(0, "/root/repo")

from circom_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from circom_tpu.circuits.gen_poseidon import generate
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec

t0 = time.time()
src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
cc = compile_source(src)
tape, _ = cc.build_tape()
spec = field_spec("bn128")
prog = WitnessProgram(tape, spec, unroll_threshold=0)
f = prog.fused
print(f"host compile {time.time()-t0:.2f}s steps={f.n_steps} "
      f"runs={f.n_runs}", flush=True)

import random

rng = random.Random(1234)
cols = [[rng.randrange(spec.p) for _ in range(batch)]
        for _ in range(prog.n_inputs)]
arr = jax.device_put(prog.encode_inputs(cols))
jax.block_until_ready(arr)

t0 = time.time()
run_fn = jax.jit(prog.jittable()).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
out_aval = jax.ShapeDtypeStruct(
    (prog.n_witness, prog.jf.L, batch), jnp.uint32)
sync_fn = jax.jit(
    lambda o: o[:, 0, :].astype(jnp.uint32).sum()).lower(
        out_aval).compile()
print(f"AOT compile {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
np.asarray(sync_fn(run_fn(arr)))
print(f"FIRST RUN (mode='{mode}', batch={batch}): "
      f"{time.time()-t0:.2f}s", flush=True)
t0 = time.time()
for _ in range(5):
    out = run_fn(arr)
np.asarray(sync_fn(out))
dt = (time.time() - t0) / 5
print(f"steady: {dt*1e3:.2f} ms -> {batch/dt:,.0f} wit/s", flush=True)
