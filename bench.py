"""Benchmark: batched Poseidon(2) witness generation, witnesses/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against a nominal 25,000 witnesses/sec for the
reference's single-threaded C++ calculator on a Poseidon(2)-class circuit
(the reference publishes no numbers — BASELINE.md; 25k/s is a generous
estimate for ~240-constraint circuits on a modern core, so the ratio is
conservative).  The north-star target is >=50x (BASELINE.json).
"""

import json
import sys
import time

import numpy as np

BASELINE_CPU_WITNESSES_PER_SEC = 25_000.0


def _tpu_alive(timeout=90):
    """Probe device init in a subprocess: the axon tunnel can wedge and
    hang jax.devices() forever; fall back to CPU so the bench always
    reports."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); import sys; "
             "sys.exit(0 if d else 1)"],
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and not _tpu_alive():
        print("# TPU device init unavailable; falling back to CPU",
              file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from circom_tpu.circuits.gen_poseidon import generate
    from circom_tpu.compiler.pipeline import compile_source
    from circom_tpu.backend.jax_backend import WitnessProgram
    from circom_tpu.field.primes import field_spec

    t0 = time.time()
    src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
    cc = compile_source(src)
    tape, _layout = cc.build_tape()
    spec = field_spec("bn128")
    prog = WitnessProgram(tape, spec, unroll_threshold=0)
    print(f"# compile: {time.time()-t0:.2f}s, tape={len(tape.ops)} ops, "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    platform = jax.devices()[0].platform
    batches = (8192, 32768, 65536) if platform != "cpu" else (256,)

    import random

    rng = random.Random(1234)
    p = spec.p

    # upload ALL device data up front: the axon relay can wedge on
    # host<->device transfers issued after a large program has executed.
    from circom_tpu.ops.limbs import ints_to_limbs

    staged = []
    for batch in batches:
        cols = [[rng.randrange(p) for _ in range(batch)]
                for _ in range(prog.n_inputs)]
        arr = jax.device_put(prog.encode_inputs(cols))
        expect = cc.witness_host({"inputs": [cols[0][0], cols[1][0]]})
        exp_dev = jax.device_put(
            np.asarray(ints_to_limbs(expect, prog.jf.L)))
        staged.append((batch, arr, exp_dev))
    jax.block_until_ready([a for (_b, a, _e) in staged])

    # AOT-compile everything (witness program per batch + the checker)
    # BEFORE the first execution: compile RPCs issued after a large
    # program has run can wedge the axon relay.
    import jax.numpy as jnp

    compiled = {}
    check_fn = {}
    sync_fn = {}
    for (batch, arr, exp_dev) in staged:
        lowered = jax.jit(prog.jittable()).lower(
            jax.ShapeDtypeStruct(arr.shape, arr.dtype))
        compiled[batch] = lowered.compile()
        n_wit = prog.n_witness
        out_aval = jax.ShapeDtypeStruct(
            (n_wit, prog.jf.L, batch), arr.dtype)
        check_fn[batch] = jax.jit(
            lambda o, e: (o[:, :, 0] == e).all()).lower(
                out_aval, jax.ShapeDtypeStruct(exp_dev.shape,
                                               exp_dev.dtype)).compile()
        # scalar reducer over the whole witness: np.asarray of its
        # output is the only reliable sync point through the axon relay
        # (block_until_ready returns before the device queue drains).
        sync_fn[batch] = jax.jit(
            lambda o: o[:, 0, :].astype(jnp.uint32).sum()).lower(
                out_aval).compile()
    print("# all programs compiled ahead of time", file=sys.stderr)

    best = 0.0
    for (batch, arr, exp_dev) in staged:
        run_fn = compiled[batch]
        t0 = time.time()
        out = run_fn(arr)
        np.asarray(sync_fn[batch](out))
        print(f"# batch {batch}: first run {time.time()-t0:.2f}s",
              file=sys.stderr)
        ok = check_fn[batch](out, exp_dev)
        assert bool(ok), f"TPU witness mismatch at batch {batch}"
        reps = 3 if platform == "cpu" else 10
        t0 = time.time()
        for _ in range(reps):
            out = run_fn(arr)
        # the device executes programs in order: forcing the last run's
        # reduction forces them all
        np.asarray(sync_fn[batch](out))
        dt = (time.time() - t0) / reps
        wps = batch / dt
        best = max(best, wps)
        print(f"# batch {batch}: {dt*1e3:.1f} ms -> {wps:,.0f} wit/s",
              file=sys.stderr)
    wps = best

    print(json.dumps({
        "metric": "poseidon2_witnesses_per_sec_per_chip",
        "value": round(wps, 1),
        "unit": "wit/s",
        "vs_baseline": round(wps / BASELINE_CPU_WITNESSES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
