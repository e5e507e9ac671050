"""Fused TPU backends (interp + segments) vs the host calculator.

Runs the Pallas kernels in interpreter mode on CPU.  Interpret mode
cost scales hard with limb count (bn128's L=16 takes ~100 s per
Montgomery mul on CPU), so these tests use goldilocks (L=4) — the
same kernel code paths with 4x16-bit limbs.  Real-hardware bn128
validation is bench.py's device-side witness check.
"""

import random

import numpy as np
import pytest

from circom_tpu.backend.interp import InterpreterProgram
from circom_tpu.backend.jax_backend import DomainTape
from circom_tpu.backend.segments import SegmentedProgram
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limbs import ints_to_limbs, limbs_to_int

PRIME = "goldilocks"
SPEC = field_spec(PRIME)

MIXED_SRC = """
pragma circom 2.0.0;
template T() {
  signal input a;
  signal input b;
  signal output o1;
  signal output o2;
  signal output o3;
  signal inter;
  inter <== a * b + 3;
  o1 <== inter * inter + a;
  o2 <-- a < b ? (a ^ b) + 5 : (a | b) - (a & b);
  o3 <-- (o2 != 0) ? a - inter : -b + inter;
  o2 * 0 === 0;
  o3 * 0 === 0;
}
component main = T();
"""


def _check(prog_cls, src, inputs_of, batch=2, seed=11, **kw):
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    dt = DomainTape(tape)
    sp = prog_cls(dt, SPEC, **kw)
    rng = random.Random(seed)
    cols = [[rng.randrange(SPEC.p) for _ in range(batch)]
            for _ in range(tape.n_inputs)]
    arr = np.stack([ints_to_limbs(c, sp.L).T.copy() for c in cols])
    out = np.asarray(sp._run(arr))  # eager: interpret-mode pallas on CPU
    assert out.shape[0] == sp.n_witness
    for b in range(batch):
        expect = cc.witness_host(inputs_of([c[b] for c in cols]))
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == list(expect), f"witness mismatch at batch {b}"
    return sp


@pytest.mark.parametrize("cls", [InterpreterProgram, SegmentedProgram])
def test_fused_mixed_ops(cls):
    _check(cls, MIXED_SRC, lambda v: {"a": v[0], "b": v[1]})


def test_interp_emission_chunking():
    """More witness rows than chunk_emits forces the chunked grid."""
    body = "\n".join(
        f"  y[{i}] <== (x + {i}) * (x + {i + 1});" for i in range(5)
    )
    src = f"""
    pragma circom 2.0.0;
    template T() {{
      signal input x;
      signal output y[5];
    {body}
    }}
    component main = T();
    """
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    dt = DomainTape(tape)
    sp = InterpreterProgram(dt, SPEC, chunk_emits=2)
    assert sp.n_chunks >= 3
    rng = random.Random(5)
    batch = 2
    cols = [[rng.randrange(SPEC.p) for _ in range(batch)]]
    arr = np.stack([ints_to_limbs(c, sp.L).T.copy() for c in cols])
    out = np.asarray(sp._run(arr))
    for b in range(batch):
        expect = cc.witness_host({"x": cols[0][b]})
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == list(expect)


def test_segments_cross_boundary_liveness():
    """A tiny budget forces many segments; values must travel across."""
    src = """
    pragma circom 2.0.0;
    template T() {
      signal input x;
      signal output y;
      signal t[4];
      t[0] <== x * x;
      t[1] <== t[0] * x + 1;
      t[2] <== t[1] * t[0];
      t[3] <== t[2] * t[1] + x;
      y <== t[3] * x;
    }
    component main = T();
    """
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    dt = DomainTape(tape)
    sp = SegmentedProgram(dt, SPEC, budget=400)
    assert len(sp.segments) >= 3
    rng = random.Random(9)
    cols = [[rng.randrange(SPEC.p) for _ in range(2)]]
    arr = np.stack([ints_to_limbs(c, sp.L).T.copy() for c in cols])
    out = np.asarray(sp._run(arr))
    for b in range(2):
        expect = cc.witness_host({"x": cols[0][b]})
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == list(expect)


def test_interp_dot_fusion():
    """MDS-style lincombs fuse into dot ops (lazy reduction)."""
    src = """
    pragma circom 2.0.0;
    template T() {
      signal input x1;
      signal input x2;
      signal input x3;
      signal output y;
      signal output z;
      y <== 3*x1 + 5*x2 + 7*x3 + 11;
      z <== 2*x1 + 9*x3;
    }
    component main = T();
    """
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    dt = DomainTape(tape)
    sp = InterpreterProgram(dt, SPEC)
    ops = sp.stats()["ops"]
    assert "dot3_c" in ops and "dot2_c" in ops, ops
    rng = random.Random(21)
    batch = 2
    cols = [[rng.randrange(SPEC.p) for _ in range(batch)]
            for _ in range(3)]
    arr = np.stack([ints_to_limbs(c, sp.L).T.copy() for c in cols])
    out = np.asarray(sp._run(arr))
    for b in range(batch):
        expect = cc.witness_host(
            {"x1": cols[0][b], "x2": cols[1][b], "x3": cols[2][b]})
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == list(expect)


def test_expanded_tape_folding_and_dce():
    """Const folding happens on raw limb values with mont semantics."""
    from circom_tpu.backend.plan import ExpandedTape

    src = """
    pragma circom 2.0.0;
    template T() {
      signal input x;
      signal output y;
      var c = 6 * 7;
      y <== x * c + (4 - 9);
    }
    component main = T();
    """
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    dt = DomainTape(tape)
    xt = ExpandedTape(dt, SPEC)
    consts = [xt.cval[i] for i in range(len(xt.ops))
              if xt.kind[i] == "const"]
    assert (42 * xt.R) % xt.p in consts or 42 in consts


def test_witness_program_selects_fused():
    """WitnessProgram plans the interpreter for supported tapes."""
    from circom_tpu.backend.jax_backend import WitnessProgram

    cc = compile_source(MIXED_SRC, prime=PRIME)
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, SPEC)
    assert isinstance(prog.fused, InterpreterProgram)


def test_interp_wide_shifts():
    """Static shifts now run in the interpreter kernel (dynamic q/r
    limb addressing); results match the host calculator."""
    src = """
    pragma circom 2.0.0;
    template T() {
      signal input a;
      signal output o1;
      signal output o2;
      o1 <-- a >> 3;
      o2 <-- a << 5;
      o1 * 0 === 0;
      o2 * 0 === 0;
    }
    component main = T();
    """
    from circom_tpu.backend.jax_backend import WitnessProgram

    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, SPEC)
    assert isinstance(prog.fused, InterpreterProgram)
    rng = random.Random(17)
    batch = 2
    cols = [[rng.randrange(SPEC.p) for _ in range(batch)]]
    arr = np.stack([ints_to_limbs(c, prog.fused.L).T.copy() for c in cols])
    out = np.asarray(prog.fused._run(arr))
    for b in range(batch):
        expect = list(cc.witness_host({"a": cols[0][b]}))
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == expect


def test_narrow_lane_bit_circuit():
    """Bit-gadget arithmetic (xor via a+b-2ab etc.) runs on the narrow
    int32 lane; witnesses must match the host calculator exactly."""
    src = """
    pragma circom 2.0.0;
    template T() {
      signal input x;
      signal output o1;
      signal output o2;
      signal output o3;
      signal b[4];
      // bit-decompose the low 4 bits (band against constants narrows)
      b[0] <-- x & 1;
      b[1] <-- (x >> 1) & 1;
      b[2] <-- (x >> 2) & 1;
      b[3] <-- (x >> 3) & 1;
      for (var i = 0; i < 4; i++) { b[i] * (b[i] - 1) === 0; }
      // xor / maj / ch gadgets over the narrowed bits
      o1 <== b[0] + b[1] - 2*b[0]*b[1];
      o2 <== b[2] * (b[0] + b[1] - 2*o1) + o1;
      o3 <-- (b[3] != 0) ? o1 : o2;
      o3 * 0 === 0;
    }
    component main = T();
    """
    from circom_tpu.backend.jax_backend import WitnessProgram

    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, SPEC)
    assert isinstance(prog.fused, InterpreterProgram)
    ops = prog.fused.stats()["ops"]
    assert any(o.startswith("n") or o == "widen" for o in ops), ops
    rng = random.Random(23)
    batch = 3
    cols = [[rng.randrange(SPEC.p) for _ in range(batch)]]
    arr = np.stack([ints_to_limbs(c, prog.fused.L).T.copy() for c in cols])
    out = np.asarray(prog.fused._run(arr))
    for b in range(batch):
        expect = list(cc.witness_host({"x": cols[0][b]}))
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == expect, [(j, g, e) for j, (g, e) in
                               enumerate(zip(got, expect)) if g != e][:4]


def test_narrow_inputs_via_range_hints():
    """Range-hinted inputs live in the narrow int32 register file;
    values within the hint produce host-identical witnesses."""
    src = """
    pragma circom 2.0.0;
    template T() {
      signal input b[4];
      signal output o[4];
      for (var i = 0; i < 4; i++) { b[i] * (b[i] - 1) === 0; }
      for (var i = 0; i < 4; i++) {
        o[i] <== b[i] + b[(i+1)%4] - 2*b[i]*b[(i+1)%4];
      }
    }
    component main = T();
    """
    from circom_tpu.backend.jax_backend import WitnessProgram

    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    hints = {i: (0, 1) for i in range(tape.n_inputs)}
    prog = WitnessProgram(tape, SPEC, input_ranges=hints)
    assert isinstance(prog.fused, InterpreterProgram)
    assert prog.fused.n_nin == 4 and prog.fused.n_win == 0
    rng = random.Random(31)
    batch = 2
    cols = [[rng.randrange(2) for _ in range(batch)] for _ in range(4)]
    arr = np.stack([ints_to_limbs(c, prog.fused.L).T.copy() for c in cols])
    out = np.asarray(prog.fused._run(arr))
    for b in range(batch):
        expect = list(cc.witness_host(
            {"b": [cols[i][b] for i in range(4)]}))
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == expect


def test_narrow_sum_reassociation():
    """Long bit lincombs regroup into int32-safe narrow partial sums."""
    terms = " + ".join(f"b[{i}] * {1 << (i % 34)}" for i in range(40))
    decomp = "\n".join(
        f"      b[{i}] <-- (x >> {i}) & 1;\n"
        f"      b[{i}] * (b[{i}] - 1) === 0;" for i in range(40))
    src = f"""
    pragma circom 2.0.0;
    template T() {{
      signal input x;
      signal output o;
      signal b[40];
{decomp}
      o <== {terms};
    }}
    component main = T();
    """
    from circom_tpu.backend.jax_backend import WitnessProgram

    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, SPEC)
    assert isinstance(prog.fused, InterpreterProgram)
    ops = prog.fused.stats()["ops"]
    assert ops.get("nadd", 0) >= 20, ops  # regrouped narrow sums
    rng = random.Random(37)
    batch = 2
    cols = [[rng.randrange(SPEC.p) for _ in range(batch)]]
    arr = np.stack([ints_to_limbs(c, prog.fused.L).T.copy() for c in cols])
    out = np.asarray(prog.fused._run(arr))
    for b in range(batch):
        expect = list(cc.witness_host({"x": cols[0][b]}))
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == expect, [(j, g, e) for j, (g, e) in
                               enumerate(zip(got, expect)) if g != e][:4]


def test_interp_multi_call_paging():
    """Instruction tables exceeding one call split into multiple
    pallas calls with the register files handed off through HBM."""
    src = """
    pragma circom 2.0.0;
    template T() { signal input x; signal output y[4];
      y[0] <== x * x + 1;
      y[1] <== y[0] * x + 2;
      y[2] <== y[1] * y[0];
      y[3] <== y[2] * x - y[1];
    }
    component main = T();
    """
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    dt = DomainTape(tape)
    sp = InterpreterProgram(dt, SPEC, chunk_emits=2, max_call_steps=4)
    assert len(sp.calls) > 1
    cols = [[5, 11]]
    arr = np.stack([ints_to_limbs(c, sp.L).T.copy() for c in cols])
    out = np.asarray(sp._run(arr))
    for b in range(2):
        expect = list(cc.witness_host({"x": cols[0][b]}))
        got = [limbs_to_int(out[i, :, b]) for i in range(out.shape[0])]
        assert got == expect


BITSUM_SRC = """
pragma circom 2.0.0;
template Mini() {
    signal input a[8];
    signal input b[8];
    signal output out[8];
    signal mid[8];
    var lc = 0;
    for (var k = 0; k < 8; k++) {
        mid[k] <== a[k] * b[k];
        lc += (a[k] + b[k] - 2*mid[k]) * 2 ** (k * 4);
    }
    signal bits[32];
    var acc = 0;
    for (var k = 0; k < 32; k++) {
        bits[k] <-- (lc >> k) & 1;
        bits[k] * (bits[k] - 1) === 0;
        acc += bits[k] * 2 ** k;
    }
    acc === lc;
    for (var k = 0; k < 8; k++) { out[k] <== bits[k * 4]; }
}
component main = Mini();
"""


def test_split_sum_bit_decomposition():
    """SHA/Num2Bits-class hint sums run fully on the narrow lane.

    The wide `lc` add-tree consumed only by (lc >> k) & 1 extractions
    becomes two int32 component sums (interp.py split-sum pre-pass);
    gadget-output bits are proven {0,1} by the exact small-support
    enumerator (ranges.GadgetSharpener).  Matches the reference
    runtime semantics of shift/band on the canonical field value
    (code_producers/src/wasm_elements/common/witness_calculator.js).
    """
    from circom_tpu.backend.jax_backend import WitnessProgram

    cc = compile_source(BITSUM_SRC, prime=PRIME)
    tape, _ = cc.build_tape()
    ranges = {i: (0, 1) for i in range(tape.n_inputs)}
    prog = WitnessProgram(tape, SPEC, unroll_threshold=0, mode="interp",
                          input_ranges=ranges)
    # the plan must be pure-narrow: no Montgomery muls, shifts or widens
    ops = prog.fused.stats()["ops"]
    assert not any(op in ops for op in
                   ("mul", "mul_c", "shr_kw", "nband_w", "widen")), ops
    rng = random.Random(7)
    B = 16
    cols = [[rng.randrange(2) for _ in range(B)] for _ in range(16)]
    arr = prog.encode_inputs(cols)
    out = np.asarray(prog.run(arr))
    for j in range(B):
        w = cc.witness_host({
            "a": [cols[k][j] for k in range(8)],
            "b": [cols[k + 8][j] for k in range(8)]})
        exp = np.asarray(ints_to_limbs(w, prog.jf.L))
        assert (out[:, :, j] == exp).all()


def test_range_seed_dedup_identical_intervals():
    """The planner's range analysis is SEEDED from the tape-level one
    (DomainTape.node_rng -> ExpandedTape.seed_rng) instead of being
    recomputed — ~1.4s -> 0.08s on SHA-class hosts.  The seeded and
    from-scratch interval sets (and hence plans) must be identical:
    tape-level rules subsume the plan-level rules on mapped nodes."""
    from circom_tpu.backend.plan import ExpandedTape, expanded_ranges
    from circom_tpu.backend.ranges import narrow_nodes

    src = """
    pragma circom 2.0.0;
    template T(n) {
      signal input x;
      signal b[n];
      signal output acc[n];
      var s = 0;
      for (var i = 0; i < n; i++) {
        b[i] <-- (x >> i) & 1;
        b[i] * (b[i] - 1) === 0;
        s += b[i] * 2 ** i;
      }
      acc[0] <== b[0] + b[1] - 2*b[0]*b[1];
      for (var i = 1; i < n; i++) {
        acc[i] <== acc[i-1] + b[i] - 2*acc[i-1]*b[i];
      }
      signal output t <== s * 1;
    }
    component main = T(24);
    """
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    nset, rng = narrow_nodes(tape)
    dt = DomainTape(tape, narrow=nset, node_rng=rng)
    xt = ExpandedTape(dt, SPEC)
    assert xt.seed_rng, "expected identity-mapped seeds"
    seeded = expanded_ranges(xt)
    xt.seed_rng = {}
    scratch = expanded_ranges(xt)
    assert seeded == scratch
