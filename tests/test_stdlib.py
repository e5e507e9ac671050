"""Standard gadget library (circuits/stdlib.circom): the circomlib-
shape building blocks, executed on both the host calculator and the
batched TPU path with per-element parity.

These exercise the ecosystem surface a reference user brings along:
bitify, comparators (signed-convention-free n-bit), boolean gates,
mux/switcher — including the division-by-inverse hint in IsZero and
the shift-and-mask hints in Num2Bits.
"""

import os
import random

import numpy as np

from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limbs import limbs_to_int

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STDLIB = os.path.join(HERE, "circom_tpu", "circuits", "stdlib.circom")
PRIME = "goldilocks"


def run_both(main_src, input_rows, names):
    """Compile include(stdlib)+main, run host + TPU batch, compare."""
    src = open(STDLIB).read() + "\n" + main_src
    cc = compile_source(src, prime=PRIME)
    tape, layout = cc.build_tape()
    spec = field_spec(PRIME)
    prog = WitnessProgram(tape, spec, unroll_threshold=0,
                          input_ranges=cc.input_range_hints())
    cols = [[row[i] % spec.p for row in input_rows]
            for i in range(len(names))]
    out = np.asarray(prog.run(prog.encode_inputs(cols)))
    results = []
    for j, row in enumerate(input_rows):
        inputs = {nm: v for nm, v in zip(names, row)}
        exp = cc.witness_host(inputs)
        got = [limbs_to_int(out[i, :, j]) for i in range(out.shape[0])]
        assert got == list(exp), f"row {j}: {got[:4]} vs {exp[:4]}"
        results.append(exp)
    return results


def test_num2bits_bits2num_roundtrip():
    res = run_both("""
template Main() {
    signal input x;
    signal output y;
    component n2b = Num2Bits(16);
    component b2n = Bits2Num(16);
    n2b.in <== x;
    for (var i = 0; i < 16; i++) { b2n.in[i] <== n2b.out[i]; }
    y <== b2n.out;
}
component main = Main();
""", [[0], [1], [65535], [43690]], ["x"])
    for row, exp in zip([0, 1, 65535, 43690], res):
        assert exp[1] == row  # roundtrip identity


def test_comparators():
    res = run_both("""
template Main() {
    signal input a;
    signal input b;
    signal output lt;
    signal output le;
    signal output gt;
    signal output ge;
    signal output eq;
    component c1 = LessThan(32);   c1.in[0] <== a; c1.in[1] <== b;
    component c2 = LessEqThan(32); c2.in[0] <== a; c2.in[1] <== b;
    component c3 = GreaterThan(32); c3.in[0] <== a; c3.in[1] <== b;
    component c4 = GreaterEqThan(32); c4.in[0] <== a; c4.in[1] <== b;
    component c5 = IsEqual(); c5.in[0] <== a; c5.in[1] <== b;
    lt <== c1.out; le <== c2.out; gt <== c3.out; ge <== c4.out;
    eq <== c5.out;
}
component main = Main();
""", [[3, 7], [7, 3], [5, 5], [0, 2**32 - 1]], ["a", "b"])
    for (a, b), exp in zip([(3, 7), (7, 3), (5, 5), (0, 2**32 - 1)], res):
        assert exp[1:6] == [int(a < b), int(a <= b), int(a > b),
                            int(a >= b), int(a == b)]


def test_gates_mux_switcher():
    rng = random.Random(4)
    rows = [[rng.randrange(2), rng.randrange(2), rng.randrange(2),
             rng.randrange(1000), rng.randrange(1000)]
            for _ in range(6)]
    res = run_both("""
template Main() {
    signal input a;
    signal input b;
    signal input s;
    signal input l;
    signal input r;
    signal output xo;
    signal output ao;
    signal output oo;
    signal output no;
    signal output mo;
    signal output swl;
    signal output swr;
    component x = XOR(); x.a <== a; x.b <== b; xo <== x.out;
    component an = AND(); an.a <== a; an.b <== b; ao <== an.out;
    component o = OR(); o.a <== a; o.b <== b; oo <== o.out;
    component n = NOT(); n.in <== a; no <== n.out;
    component m = Mux1(); m.c[0] <== l; m.c[1] <== r; m.s <== s;
    mo <== m.out;
    component sw = Switcher(); sw.sel <== s; sw.L <== l; sw.R <== r;
    swl <== sw.outL; swr <== sw.outR;
}
component main = Main();
""", rows, ["a", "b", "s", "l", "r"])
    for (a, b, s, l, r), exp in zip(rows, res):
        assert exp[1:8] == [a ^ b, a & b, a | b, 1 - a,
                            r if s else l,
                            r if s else l, l if s else r]


def test_iszero_inverse_hint():
    """IsZero's 1/in hint exercises witness-dependent field division
    (Fermat inversion chain) on the TPU path."""
    res = run_both("""
template Main() {
    signal input x;
    signal output z;
    component i = IsZero();
    i.in <== x;
    z <== i.out;
}
component main = Main();
""", [[0], [1], [123456789]], ["x"])
    assert [r[1] for r in res] == [1, 0, 0]
