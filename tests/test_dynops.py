"""Witness-dependent idiv/mod/pow/dynamic shifts on the TPU backends.

The reference's IR carries these as first-class runtime operators
(compute_bucket.rs:7-34) executed per element by every emitted runtime;
here they lower to static batched dataflow (backend/dynops.py) with
idiv as a limb-level long-division primitive.  Host oracle:
field/hostfield.py (mirrors modular_arithmetic.rs).
"""

import random

import numpy as np
import pytest

from circom_tpu.backend.dynops import lower_dynamic_ops
from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.backend.tape import Tape
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.field.hostfield import HostField
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.jfield import JaxField
from circom_tpu.ops.limbs import ints_to_limbs, limbs_to_int


def _interesting(p, rng, n):
    """Random field values biased toward the edge cases of the wrap/
    signed-convention rules."""
    bits = p.bit_length()
    picks = [0, 1, 2, bits - 1, bits, bits + 1, p - 1, p - 2,
             p // 2, p // 2 + 1, p // 2 + 2, (1 << 31) - 1, 1 << 31]
    out = []
    for _ in range(n):
        c = rng.random()
        if c < 0.4:
            out.append(picks[rng.randrange(len(picks))] % p)
        elif c < 0.7:
            out.append(rng.randrange(min(p, 1 << 16)))
        else:
            out.append(rng.randrange(p))
    return out


@pytest.mark.parametrize("prime", ["goldilocks", "bn128"])
def test_jfield_idiv_oracle(prime):
    """Batched long division vs Python ints, incl. the idiv(a,0)=0
    batched contract (host path raises instead)."""
    spec = field_spec(prime)
    jf = JaxField(spec)
    rng = random.Random(5)
    a = _interesting(spec.p, rng, 33)
    b = _interesting(spec.p, rng, 33)
    b[0] = 0  # division-by-zero contract
    xa = jf.encode(a)
    xb = jf.encode(b)
    q = np.asarray(jf.idiv(xa, xb))
    got = jf.decode(q)
    want = [ai // bi if bi else 0 for ai, bi in zip(a, b)]
    assert got == want


def _run_tape_op(op, prime, pairs, mode="auto", unroll=4096,
                 input_ranges=None):
    """Build a 2-input tape computing op(in0, in1); run the JAX backend
    on a batch of value pairs; return canonical ints."""
    spec = field_spec(prime)
    t = Tape(spec.p)
    a, b = t.input(0), t.input(1)
    t.set_outputs([t.emit(op, a, b)])
    prog = WitnessProgram(t, spec, unroll_threshold=unroll, mode=mode,
                          input_ranges=input_ranges)
    cols = [[x % spec.p for (x, _y) in pairs],
            [y % spec.p for (_x, y) in pairs]]
    out = np.asarray(prog.run(prog.encode_inputs(cols)))
    return [limbs_to_int(out[0, :, j]) for j in range(len(pairs))], prog


@pytest.mark.parametrize("prime", ["goldilocks", "bn128"])
@pytest.mark.parametrize("op", ["shl", "shr", "pow", "mod", "idiv"])
def test_dynamic_op_vs_host(prime, op):
    """Every witness-dependent dynamic op matches the host oracle on
    the (lowered) JAX path, including the wrap rule (k > p/2 shifts
    the other way), k >= p.bit_length() (-> 0), and huge operands."""
    spec = field_spec(prime)
    hf = HostField(spec)
    rng = random.Random(7 + len(op))
    pairs = list(zip(_interesting(spec.p, rng, 40),
                     _interesting(spec.p, rng, 40)))
    if op in ("mod", "idiv"):
        pairs = [(x, y if y else 3) for (x, y) in pairs]
    # scan path (unroll=0): XLA graph is O(#opcodes) — the unrolled
    # SSA form of a 254-step pow ladder takes minutes of CPU compile
    got, _prog = _run_tape_op(op, prime, pairs, unroll=0)
    fn = {"shl": hf.shift_l, "shr": hf.shift_r, "pow": hf.pow,
          "mod": hf.mod, "idiv": hf.idiv}[op]
    want = [fn(x % spec.p, y % spec.p) for (x, y) in pairs]
    assert got == want


def test_dynamic_div_by_zero_contract():
    """idiv(a,0)=0 and mod(a,0)=a on the batched path (the host
    calculator raises; dynops.py documents the divergence)."""
    for op, want in (("idiv", [0, 0]), ("mod", [7, 123456])):
        got, _ = _run_tape_op(op, "goldilocks", [(7, 0), (123456, 0)])
        assert got == want


def test_interp_kernel_idiv():
    """The production Pallas interpreter executes the idiv opcode
    (in-kernel long-division fori_loop) — interpret mode on CPU,
    goldilocks for speed (see test_fused.py header)."""
    spec = field_spec("goldilocks")
    rng = random.Random(3)
    pairs = [(rng.randrange(spec.p), rng.randrange(1, spec.p))
             for _ in range(4)]
    pairs[0] = (pairs[0][0], 0)  # contract case
    got, prog = _run_tape_op("idiv", "goldilocks", pairs,
                             mode="interp", unroll=0)
    assert "idiv" in prog.fused.stats()["ops"]
    want = [x // y if y else 0 for (x, y) in pairs]
    assert got == want


def test_interp_kernel_nidiv_narrow_lane():
    """Range-hinted small operands run idiv on the narrow int32 lane
    (one VPU divide instead of a 64/254-step loop)."""
    spec = field_spec("goldilocks")
    pairs = [(1000, 7), (65535, 255), (5, 9), (17, 0)]
    got, prog = _run_tape_op(
        "idiv", "goldilocks", pairs, mode="interp", unroll=0,
        input_ranges={0: (0, 1 << 20), 1: (0, 1 << 12)})
    ops = prog.fused.stats()["ops"]
    assert "nidiv" in ops and "idiv" not in ops
    assert got == [x // y if y else 0 for (x, y) in pairs]


def test_lowering_is_noop_without_dynamic_ops():
    t = Tape(97)
    a, b = t.input(0), t.input(1)
    t.set_outputs([t.emit("add", a, b)])
    assert lower_dynamic_ops(t) is t


BIGINT_DIV_HINT = """
pragma circom 2.0.0;
template LongDiv(n) {
    // circomlib-style bigint hint: witness-dependent \\ and % inside
    // a data-dependent while (the reference executes this in its
    // emitted runtimes, loop_bucket.rs + compute_bucket.rs)
    signal input a;
    signal input b;
    signal output digits[n];
    signal output q;
    signal output r;
    q <-- a \\ b;
    r <-- a % b;
    a === q * b + r;
    var x = a;
    var i = 0;
    var d[n];
    while (x > 0 && i < n) {
        d[i] = x % 10;
        x = x \\ 10;
        i++;
    }
    for (var j = 0; j < n; j++) { digits[j] <-- d[j]; digits[j]*0 === 0; }
}
component main = LongDiv(8);
"""


def test_bigint_division_hint_circuit():
    """End-to-end: a circuit whose `<--` hints do witness-dependent
    integer division and modulo inside a data-dependent while runs on
    the batched TPU path with host parity (VERDICT r2 item 1)."""
    cc = compile_source(BIGINT_DIV_HINT, prime="goldilocks")
    tape, _ = cc.build_tape()
    assert "idiv" in tape.ops and "mod" in tape.ops
    spec = field_spec("goldilocks")
    prog = WitnessProgram(tape, spec, unroll_threshold=0, mode="interp")
    rng = random.Random(9)
    B = 4
    cols = [[rng.randrange(1, 10**7) for _ in range(B)],
            [rng.randrange(1, 10**4) for _ in range(B)]]
    out = np.asarray(prog.run(prog.encode_inputs(cols)))
    n_wit = prog.n_witness - prog.n_guards
    assert not out[n_wit:].any()  # unroll guards quiet
    for j in range(B):
        w = cc.witness_host({"a": cols[0][j], "b": cols[1][j]})
        got = [limbs_to_int(out[i, :, j]) for i in range(n_wit)]
        assert got == list(w)


DYN_SHIFT_POW = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal input k;
    signal output o;
    o <-- (a >> k) + (a << k) + a ** k;
    o * 0 === 0;
}
component main = T();
"""


def test_dynamic_shift_pow_circuit():
    cc = compile_source(DYN_SHIFT_POW, prime="goldilocks")
    tape, _ = cc.build_tape()
    assert {"shl", "shr", "pow"} <= set(tape.ops)
    spec = field_spec("goldilocks")
    prog = WitnessProgram(tape, spec, unroll_threshold=0)
    cases = [(123456789, 5), (spec.p - 3, 63), (7, spec.p - 2),
             (spec.p - 1, 64), (1, 0)]
    cols = [[x for (x, _k) in cases], [k for (_x, k) in cases]]
    out = np.asarray(prog.run(prog.encode_inputs(cols)))
    for j, (x, k) in enumerate(cases):
        w = cc.witness_host({"a": x, "k": k})
        got = [limbs_to_int(out[i, :, j]) for i in range(out.shape[0])]
        assert got == list(w), f"case {j}"


def _digit_loop(cond, n=5):
    return f"""
pragma circom 2.0.0;
template T() {{
    signal input a;
    signal output o;
    var x = a;
    var i = 0;
    var acc = 0;
    while ({cond}) {{
        acc = acc + (x % 10);
        x = x \\ 10;
        i = i + 1;
    }}
    o <-- acc;
    o * 0 === 0;
}}
component main = T();
"""


def test_derived_trip_bound_unrolls_exactly():
    """A `i < k` conjunct with known start/bound and an unconditional
    unit increment derives the trip count: the loop unrolls exactly k
    iterations (not while_max_unroll) and needs NO runtime guard
    (VERDICT r2 item 5)."""
    cc = compile_source(_digit_loop("x > 0 && i < 5"), prime="goldilocks")
    t64, _ = cc.build_tape()                    # default bound 64
    assert t64.n_guards == 0
    assert t64.ops.count("mod") == 5            # one x%10 per iteration
    t5, _ = cc.build_tape(while_max_unroll=5)
    assert len(t5.ops) == len(t64.ops)          # bound didn't matter
    # mirrored comparison and <= derive too
    tm, _ = compile_source(_digit_loop("5 > i && x > 0"),
                           prime="goldilocks").build_tape()
    assert tm.n_guards == 0 and tm.ops.count("mod") == 5
    tle, _ = compile_source(_digit_loop("x > 0 && i <= 4"),
                            prime="goldilocks").build_tape()
    assert tle.n_guards == 0 and tle.ops.count("mod") == 5


def test_underived_loop_uses_flag_bound_and_guard():
    """No counter conjunct -> while_max_unroll applies and the runtime
    guard rides the tape (the T3013 contract)."""
    cc = compile_source(_digit_loop("x > 0"), prime="goldilocks")
    t7, _ = cc.build_tape(while_max_unroll=7)
    assert t7.n_guards == 1
    assert t7.ops.count("mod") == 7
    # conditional increments must NOT derive (element may stall active)
    src = _digit_loop("x > 0 && i < 5").replace(
        "i = i + 1;", "if (x > 9) { i = i + 1; }")
    tc, _ = compile_source(src, prime="goldilocks").build_tape(
        while_max_unroll=9)
    assert tc.n_guards == 1 and tc.ops.count("mod") == 9


def test_derived_bound_witness_parity():
    """Derived-bound loop still computes correct witnesses batched."""
    cc = compile_source(_digit_loop("x > 0 && i < 5"), prime="goldilocks")
    tape, _ = cc.build_tape()
    spec = field_spec("goldilocks")
    prog = WitnessProgram(tape, spec, unroll_threshold=0)
    cols = [[98765, 3, 120450, 99999]]
    out = np.asarray(prog.run(prog.encode_inputs(cols)))
    for j, x in enumerate(cols[0]):
        w = cc.witness_host({"a": x})
        got = [limbs_to_int(out[i, :, j]) for i in range(out.shape[0])]
        assert got == list(w)


def test_cli_while_max_unroll_flag(tmp_path):
    """The flag the T3013 message names exists and changes the bound."""
    import json as _json
    from circom_tpu.cli import main as cli_main

    circ = tmp_path / "loop.circom"
    circ.write_text(_digit_loop("x > 0"))
    inp = tmp_path / "in.json"
    inp.write_text(_json.dumps([{"a": 10**30}]))  # 31 digits
    rc = cli_main([str(circ), "--prime", "bn128", "-o", str(tmp_path),
                   "--witness-tpu", str(inp), "--while_max_unroll", "4",
                   "--sanity_check", "0"])
    assert rc == 1  # guard fires: 31 digits > 4 unrolls -> T3013
