"""Multi-process (multi-host) witness generation via jax.distributed.

The reference has no distributed backend at all (SURVEY.md §2.12 — its
parallelism is threads on one host, calcwit.hpp:33-38); the TPU-native
scale-out axis is a PROCESS-SPANNING mesh: every host runs this same
program, `jax.distributed.initialize` forms the global device mesh,
the witness batch shards across all hosts' chips (zero collectives on
the witness path — witnesses are independent), and the R1CS checker's
all-ok reduction is the one cross-host collective (psum over ICI/DCN).

Without a multi-host TPU slice this module validates the full
mechanism on CPU: N processes × D virtual devices each
(xla_force_host_platform_device_count), the exact simulation recipe
SURVEY.md §4 names.  Usage:

    python -m circom_tpu.parallel.multihost --spawn 2 --out mp.json

spawns 2 coordinated processes, runs the sharded witness+checker step
across them, verifies PER-ELEMENT parity against the host calculator,
and writes a run artifact.  The same entry runs one worker role on a
real multi-host slice (omit --spawn; pass --coordinator/--nproc/--pid
with JAX_PLATFORMS unset so real TPU devices are used).
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

SRC = """
pragma circom 2.0.0;
template Square() {
    signal input in;
    signal output out;
    out <== in * in;
}
template Chain(n) {
    signal input in;
    signal output out;
    component s[n];
    for (var i = 0; i < n; i++) {
        s[i] = Square();
        s[i].in <== i == 0 ? in : s[i-1].out;
    }
    out <== s[n-1].out;
}
component main = Chain(4);
"""


def _worker(coordinator, nproc, pid, local_devices, out_path, prime):
    # device topology must be fixed BEFORE jax initializes a backend
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    import numpy as np

    n_global = nproc * local_devices
    assert len(jax.devices()) == n_global, (
        f"process {pid}: expected {n_global} global devices, "
        f"got {len(jax.devices())}")
    assert len(jax.local_devices()) == local_devices

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..backend.checker import R1CSChecker
    from ..backend.jax_backend import WitnessProgram
    from ..compiler.pipeline import compile_source
    from ..field.primes import field_spec
    from ..ops.limbs import limbs_to_int
    from .mesh import make_mesh, shard_checker, shard_program

    spec = field_spec(prime)
    cc = compile_source(SRC, prime=prime)
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, spec, unroll_threshold=0)
    checker = R1CSChecker(cc.r1cs_rows(), cc.counts()["n_wires"], spec)

    # identical global batch in every process (seeded); each process
    # materializes only ITS shard — exactly how per-host input loading
    # works on a real slice
    per_dev = 4
    B = n_global * per_dev
    rng = np.random.default_rng(1234)
    values = [int(v) % spec.p for v in rng.integers(0, 1 << 62, size=B)]
    cols_global = [values]
    full = prog.encode_inputs(cols_global)          # (n_in, L, B)
    lo = pid * local_devices * per_dev
    hi = lo + local_devices * per_dev
    local = full[:, :, lo:hi]

    mesh = make_mesh(n_global)
    sharding = NamedSharding(mesh, P(None, None, "batch"))
    garr = jax.make_array_from_process_local_data(sharding, local)

    step = shard_program(prog, mesh, use_fused=False)
    t0 = time.time()
    out = step(garr)
    ok_fn = shard_checker(checker.check, mesh)
    ok = ok_fn(out)
    # the all-ok reduction is replicated: fetching it on every process
    # exercises the cross-process collective
    ok_host = bool(np.asarray(ok).all())
    step_s = time.time() - t0

    # per-element parity on THIS process's output shards
    n_checked = 0
    for shard in out.addressable_shards:
        sl = shard.index[2]
        data = np.asarray(shard.data)
        for j_local, j_global in enumerate(
                range(sl.start or 0, sl.stop)):
            exp = cc.witness_host({"in": values[j_global]})
            got = [limbs_to_int(data[i, :, j_local])
                   for i in range(data.shape[0])]
            assert got == list(exp), (
                f"process {pid}: witness {j_global} mismatch")
            n_checked += 1
    assert n_checked == local_devices * per_dev

    if pid == 0 and out_path:
        with open(out_path, "w") as f:
            json.dump({
                "ok": ok_host,
                "n_processes": nproc,
                "devices_per_process": local_devices,
                "global_devices": n_global,
                "batch": B,
                "elements_checked_per_process": n_checked,
                "parity": "exact",
                "checker_all_ok": ok_host,
                "step_seconds_first_call": round(step_s, 3),
                "platform": jax.devices()[0].platform,
                "mechanism": "jax.distributed + process-spanning mesh; "
                             "batch sharded P(None,None,'batch'); "
                             "checker reduction is the cross-process "
                             "collective",
            }, f, indent=1)
    jax.distributed.shutdown()


def _spawn(nproc, local_devices, out_path, prime):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "circom_tpu.parallel.multihost",
             "--coordinator", coord, "--nproc", str(nproc),
             "--pid", str(pid), "--local-devices", str(local_devices),
             "--out", out_path if pid == 0 else "",
             "--prime", prime],
            env=env))
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker exit codes: {rcs}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spawn", type=int, default=0,
                    help="spawn N coordinated worker processes")
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", default="")
    ap.add_argument("--prime", default="goldilocks")
    args = ap.parse_args(argv)
    if args.spawn:
        return _spawn(args.spawn, args.local_devices, args.out,
                      args.prime)
    _worker(args.coordinator, args.nproc, args.pid, args.local_devices,
            args.out, args.prime)
    return 0


if __name__ == "__main__":
    sys.exit(main())
