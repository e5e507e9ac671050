import os, sys, time
import numpy as np
mode = sys.argv[1] if len(sys.argv) > 1 else ""
os.environ["CTPU_ABLATE"] = mode
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
t0 = time.time()
low = jax.jit(f._run_mixed).lower(
    jax.ShapeDtypeStruct((512, f.L, batch), jnp.uint32))
print(f"lower: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
comp = low.compile()
print(f"compile(mode='{mode}'): {time.time()-t0:.1f}s", flush=True)
