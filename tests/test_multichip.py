"""Sharded execution tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.backend.checker import R1CSChecker
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limbs import ints_to_limbs

SPEC = field_spec("bn128")

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
component main = Chain(3);
"""


def test_checker_accepts_and_rejects():
    cc = compile_source(SRC)
    checker = R1CSChecker(cc.r1cs_rows(), cc.dag.total_signals(), SPEC)
    w_good = cc.witness_host({"in": 3})
    w_bad = list(w_good)
    w_bad[1] = (w_bad[1] + 1) % SPEC.p
    ok = checker.check_witness_list([w_good, w_bad, w_good])
    assert list(ok) == [True, False, True]


def test_sharded_witness_and_check():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from circom_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "conftest should force 8 cpu devices"
    cc = compile_source(SRC)
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, SPEC, unroll_threshold=0)
    checker = R1CSChecker(cc.r1cs_rows(), cc.dag.total_signals(), SPEC)
    mesh = make_mesh(8)

    import jax.numpy as jnp

    def step(inputs):
        wit = prog.jittable()(inputs)      # (n_wires, L, batch)
        return jnp.all(checker.check(wit))

    batch = 16
    vals = [(i * 7 + 1) % SPEC.p for i in range(batch)]
    arr = prog.encode_inputs([vals])
    in_sh = NamedSharding(mesh, P(None, None, "batch"))
    fn = jax.jit(step, in_shardings=in_sh,
                 out_shardings=NamedSharding(mesh, P()))
    arr = jax.device_put(arr, in_sh)
    assert bool(fn(arr))

    # per-element parity vs host
    out = jax.jit(prog.jittable(), in_shardings=in_sh,
                  out_shardings=NamedSharding(mesh, P(None, None, "batch")))(arr)
    got = prog.decode_outputs(np.asarray(out))
    for b in range(batch):
        expect = cc.witness_host({"in": vals[b]})
        assert [got[i][b] for i in range(len(got))] == expect


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_shard_map_fused_interpreter():
    """The production fused path shards via shard_map (pallas custom
    calls cannot be auto-partitioned); validated on the virtual mesh in
    interpret mode with a tiny goldilocks circuit."""
    import jax

    from circom_tpu.parallel.mesh import make_mesh, shard_program
    from circom_tpu.backend.interp import InterpreterProgram

    spec = field_spec("goldilocks")
    src = """
    pragma circom 2.0.0;
    template T() { signal input a; signal input b; signal output o;
      o <== a * b + 3; }
    component main = T();
    """
    cc = compile_source(src, prime="goldilocks")
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, spec, unroll_threshold=0)
    assert isinstance(prog.fused, InterpreterProgram)
    mesh = make_mesh(8)
    fn = shard_program(prog, mesh, use_fused=True)
    batch = 16  # 2 per device
    cols = [[(7 * i + k) % spec.p for i in range(batch)] for k in (1, 2)]
    arr = np.stack([ints_to_limbs(c, prog.jf.L).T.copy() for c in cols])
    out = np.asarray(fn(arr))
    from circom_tpu.ops.limbs import limbs_to_int

    for i in range(batch):
        expect = list(cc.witness_host({"a": cols[0][i], "b": cols[1][i]}))
        got = [limbs_to_int(out[j, :, i]) for j in range(out.shape[0])]
        assert got == expect, i
