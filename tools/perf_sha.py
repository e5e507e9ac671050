"""Quick SHA256 perf probe with digest check."""
import sys, time, hashlib, random
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.field.primes import field_spec
sys.path.insert(0, "/root/repo")
import importlib.util as iu
spec_b = iu.spec_from_file_location("benchmod", "/root/repo/bench.py")
bench = iu.module_from_spec(spec_b); spec_b.loader.exec_module(bench)

t0 = time.time()
src = (open("circom_tpu/circuits/sha256.circom").read()
       + "\ncomponent main = Sha256Block();\n")
cc = compile_source(src)
tape, _ = cc.build_tape()
spec = field_spec("bn128")
ranges = cc.input_range_hints()
prog = WitnessProgram(tape, spec, unroll_threshold=0, mode="interp",
                      input_ranges=ranges)
f = prog.fused
print(f"compile {time.time()-t0:.1f}s steps={f.n_steps} runs={f.n_runs} "
      f"nregs={f.n_nregs} lanes={f.lanes} chunks={f.n_chunks} "
      f"calls={len(f.calls)}", file=sys.stderr)

nidx, _w = prog.mixed_layout()
row_of = {wi: r for r, wi in enumerate(nidx)}
out_rows = np.asarray([row_of[1 + k] for k in range(256)], np.int32)
rng = random.Random(99)
batch = 16384
msgs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(batch)]
bits = np.stack([bench.msg_to_bits(m) for m in msgs], axis=1)
arr = np.zeros((512, prog.jf.L, batch), np.uint32)
arr[:, 0, :] = bits
exp = np.zeros((256, batch), np.int32)
for j, m in enumerate(msgs):
    d = hashlib.sha256(m).digest()
    for w in range(8):
        word = int.from_bytes(d[4*w:4*w+4], "big")
        for k in range(32):
            exp[32*w+k, j] = (word >> k) & 1
arr = jax.device_put(arr); exp_dev = jax.device_put(exp)
rows_dev = jax.device_put(out_rows)
run_fn = jax.jit(f._run_mixed).lower(
    jax.ShapeDtypeStruct(arr.shape, arr.dtype)).compile()
n_nw = len(nidx)
nw_aval = jax.ShapeDtypeStruct((n_nw, batch), jnp.int32)
check_fn = jax.jit(lambda nw, rows, e: (jnp.take(nw, rows, axis=0) == e)
                   .all()).lower(nw_aval,
                                 jax.ShapeDtypeStruct(rows_dev.shape, jnp.int32),
                                 jax.ShapeDtypeStruct(exp.shape, jnp.int32)).compile()
sync_fn = jax.jit(lambda nw: nw.sum()).lower(nw_aval).compile()
t0 = time.time()
nw, _wd = run_fn(arr)
np.asarray(sync_fn(nw))
print(f"first run {time.time()-t0:.1f}s", file=sys.stderr)
assert bool(check_fn(nw, rows_dev, exp_dev)), "digest mismatch"
t0 = time.time()
for _ in range(5):
    nw, _wd = run_fn(arr)
np.asarray(sync_fn(nw))
dt = (time.time() - t0) / 5
print(f"sha256 batch {batch}: {dt*1e3:.1f} ms -> {batch/dt:,.0f} wit/s "
      f"(digest-checked)")
