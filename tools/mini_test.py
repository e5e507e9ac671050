import os, sys, collections
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limbs import ints_to_limbs
cc = compile_source(open("/tmp/mini.circom").read(), prime="goldilocks")
tape, _ = cc.build_tape()
ranges = cc.input_range_hints()
print("hints:", len(ranges), "inputs:", tape.n_inputs)
prog = WitnessProgram(tape, field_spec("goldilocks"), unroll_threshold=0,
                      mode="interp", input_ranges=ranges)
f = prog.fused
print("steps:", f.n_steps, "n_regs:", f.n_regs, "n_nregs:", f.n_nregs,
      "bit_src:", len(f._bit_src), "K:", f.K, "KN:", f.KN)
names = list(f.opset_n) + list(f.opset_w)
print(dict(collections.Counter(names[k] for k in f.table[:, 0])))
import random
rng = random.Random(5)
batch = 8
cols = [[rng.randrange(2) for _ in range(batch)] for _ in range(tape.n_inputs)]
arr = prog.encode_inputs(cols)
out = np.asarray(prog.fused._run(np.asarray(arr)))
exp_cols = []
for j in range(batch):
    w = cc.witness_host({"x": [cols[k][j] for k in range(32)],
                         "y": [cols[32 + k][j] for k in range(32)]})
    exp_cols.append(np.asarray(ints_to_limbs(list(w), prog.jf.L)))
exp = np.stack(exp_cols, axis=-1)
ok = (out == exp).all()
print("tape == host:", bool(ok))
if not ok:
    bad = np.argwhere((out != exp).any(axis=(1, 2)))[:12].ravel()
    print("bad witness rows:", bad, "of", out.shape[0])
