import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import circom_tpu.backend.interp as interp_mod
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec

# temporarily relax the VMEM gate to inspect the plan
orig_init = interp_mod.InterpreterProgram.__init__
src = (open("/root/repo/circom_tpu/circuits/sha256.circom").read()
       + "\ncomponent main = Sha256Block();\n")
cc = compile_source(src)
tape, _ = cc.build_tape()
spec = field_spec("bn128")
ranges = cc.input_range_hints()
try:
    prog = WitnessProgram(tape, spec, unroll_threshold=0, mode="interp",
                          input_ranges=ranges)
    f = prog.fused
    print(dict(steps=f.n_steps, K=f.K, KN=f.KN, n_regs=f.n_regs,
               n_nregs=f.n_nregs, n_win=f.n_win, n_nin=f.n_nin,
               lanes=f.lanes, calls=len(f.calls)))
except Exception as e:
    import traceback
    # patch lanes: pass explicit small lanes to bypass the gate
    p = WitnessProgram.__new__(WitnessProgram)
    try:
        prog = WitnessProgram(tape, spec, unroll_threshold=0,
                              mode="interp", input_ranges=ranges,
                              lanes=8)
        f = prog.fused
        print(dict(steps=f.n_steps, K=f.K, KN=f.KN, n_regs=f.n_regs,
                   n_nregs=f.n_nregs, n_win=f.n_win, n_nin=f.n_nin,
                   lanes=f.lanes, calls=len(f.calls)))
    except Exception as e2:
        print("ERR:", e2)
