"""Bus support: declarations, field access, nesting, arrays, io buses."""

import pytest

from circom_tpu.compiler.pipeline import compile_source

POINT = """
pragma circom 2.0.0;
bus Point() {
    signal x;
    signal y;
}
template Translate() {
    input Point p;
    input Point delta;
    output Point out;
    out.x <== p.x + delta.x;
    out.y <== p.y + delta.y;
}
component main = Translate();
"""


def test_bus_basic():
    cc = compile_source(POINT, simplification="O0")
    # wires: 0 const, out.x, out.y, p.x, p.y, delta.x, delta.y
    assert cc.dag.total_signals() == 7
    w = cc.witness_host({"p": [1, 2], "delta": [10, 20]})
    assert w[1:3] == [11, 22]
    syms = [l.split(",")[3] for l in cc.sym_lines()]
    assert syms[:2] == ["main.out.x", "main.out.y"]


def test_bus_whole_assignment():
    src = """
pragma circom 2.0.0;
bus Point() { signal x; signal y; }
template Id() {
    input Point p;
    output Point out;
    out <== p;
}
component main = Id();
"""
    cc = compile_source(src)
    w = cc.witness_host({"p": [7, 9]})
    assert w[1:3] == [7, 9] or w[1] == 7  # O1 may alias out to p


def test_bus_arrays_and_params():
    src = """
pragma circom 2.0.0;
bus Vec(n) {
    signal v[n];
}
template SumVec(n) {
    input Vec(n) a;
    signal output out;
    var acc = 0;
    for (var i = 0; i < n; i++) { acc += a.v[i]; }
    out <== acc;
}
component main = SumVec(4);
"""
    cc = compile_source(src)
    w = cc.witness_host({"a": [1, 2, 3, 4]})
    assert w[1] == 10


def test_nested_buses():
    src = """
pragma circom 2.0.0;
bus Point() { signal x; signal y; }
bus Segment() {
    Point a;
    Point b;
}
template Len2() {
    input Segment s;
    signal output out;
    signal dx;
    signal dy;
    signal dx2;
    dx <== s.b.x - s.a.x;
    dy <== s.b.y - s.a.y;
    dx2 <== dx*dx;
    out <== dx2 + dy*dy;
}
component main = Len2();
"""
    cc = compile_source(src)
    w = cc.witness_host({"s": [1, 2, 4, 6]})
    assert w[1] == 9 + 16


def test_bus_array_of_buses():
    src = """
pragma circom 2.0.0;
bus Point() { signal x; signal y; }
template SumX(n) {
    input Point ps[n];
    signal output out;
    var acc = 0;
    for (var i = 0; i < n; i++) { acc += ps[i].x; }
    out <== acc;
}
component main = SumX(3);
"""
    cc = compile_source(src)
    # flat leaf order: ps[0].x, ps[0].y, ps[1].x, ...
    w = cc.witness_host({"ps": [1, 100, 2, 200, 3, 300]})
    assert w[1] == 6


def test_bus_between_components():
    src = """
pragma circom 2.0.0;
bus Point() { signal x; signal y; }
template MkPoint() {
    signal input a;
    output Point p;
    p.x <== a + 1;
    p.y <== a * 2;
}
template Main() {
    signal input a;
    signal output out;
    component m = MkPoint();
    m.a <== a;
    out <== m.p.x * m.p.y;
}
component main = Main();
"""
    cc = compile_source(src)
    w = cc.witness_host({"a": 5})
    assert w[1] == 6 * 10


def test_bus_component_whole_bus_wiring():
    src = """
pragma circom 2.0.0;
bus Point() { signal x; signal y; }
template Flip() {
    input Point p;
    output Point out;
    out.x <== p.y;
    out.y <== p.x;
}
template Main() {
    input Point p;
    output Point out;
    component f = Flip();
    f.p <== p;
    out <== f.out;
}
component main = Main();
"""
    cc = compile_source(src)
    w = cc.witness_host({"p": [3, 4]})
    assert w[1:3] == [4, 3]


def test_tagged_inputs_and_memoization():
    """Input tags: required on assignment, values flow into the instance
    identity; Num2Bits-style valued tags readable in the child."""
    src = """
pragma circom 2.0.0;
template ForceBits(n) {
    signal input in;
    signal output {binary} out[n];
    var lc = 0;
    for (var i = 0; i < n; i++) {
        out[i] <-- (in >> i) & 1;
        out[i] * (out[i] - 1) === 0;
        lc += out[i] * 2 ** i;
    }
    lc === in;
}
template TakesBit() {
    signal input {binary} b;
    signal output out;
    out <== 1 - b;
}
template Main() {
    signal input x;
    signal output out;
    component n2b = ForceBits(4);
    n2b.in <== x;
    component t = TakesBit();
    t.b <== n2b.out[0];
    out <== t.out;
}
component main = Main();
"""
    cc = compile_source(src)
    w = cc.witness_host({"x": 5})
    assert w[1] == 0  # lsb of 5 is 1 -> out = 0


def test_tag_required_rejects_untagged():
    src = """
pragma circom 2.0.0;
template TakesBit() {
    signal input {binary} b;
    signal output out;
    out <== 1 - b;
}
template Main() {
    signal input x;
    signal output out;
    component t = TakesBit();
    t.b <== x;  // x carries no binary tag
    out <== t.out;
}
component main = Main();
"""
    from circom_tpu.compiler.values import ExecError

    with pytest.raises(ExecError):
        compile_source(src)


def test_valued_tag_read_in_child():
    src = """
pragma circom 2.0.0;
template Sized() {
    signal input {maxbits} v;
    signal output out;
    out <== v * v.maxbits;
}
template Main() {
    signal input x;
    signal {maxbits} y;
    signal output out;
    y.maxbits = 8;
    y <== x;
    component s = Sized();
    s.v <== y;
    out <== s.out;
}
component main = Main();
"""
    cc = compile_source(src)
    w = cc.witness_host({"x": 3})
    assert w[1] == 24  # 3 * 8


def test_bus_json_input_qualification(tmp_path):
    """Dot-path and nested-dict bus inputs (witness_calculator.js
    qualification)."""
    import json

    from circom_tpu.emit.inputs import load_inputs, prepare_main_inputs

    cc = compile_source(POINT)
    # nested dict form
    raw = load_inputs({"p": {"x": 1, "y": 2},
                       "delta": {"x": 10, "y": 20}}, cc.p)
    inputs = prepare_main_inputs(cc, raw)
    w = cc.witness_host(inputs)
    assert w[1:3] == [11, 22]
    # dot-path form
    raw2 = load_inputs({"p.x": 1, "p.y": 2, "delta.x": 10, "delta.y": 20},
                       cc.p)
    inputs2 = prepare_main_inputs(cc, raw2)
    assert cc.witness_host(inputs2) == w
