"""Anonymous components and tuples (syntax_sugar_remover.rs parity)."""

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.utils.reports import ReportCollection

ANON = """
pragma circom 2.0.0;
template Mul() {
    signal input a;
    signal input b;
    signal output c;
    c <== a * b;
}
template Main() {
    signal input x;
    signal input y;
    signal output out;
    out <== Mul()(x, y);
}
component main = Main();
"""


def test_anonymous_component_basic():
    cc = compile_source(ANON)
    w = cc.witness_host({"x": 6, "y": 7})
    assert w[1] == 42


def test_anonymous_component_named_inputs():
    src = ANON.replace("Mul()(x, y)", "Mul()(b <== y, a <== x)")
    cc = compile_source(src)
    w = cc.witness_host({"x": 6, "y": 7})
    assert w[1] == 42


def test_anonymous_multi_output_tuple():
    src = """
pragma circom 2.0.0;
template DivMod() {
    signal input a;
    signal input b;
    signal output q;
    signal output r;
    q <-- a \\ b;
    r <-- a % b;
    a === b * q + r;
}
template Main() {
    signal input x;
    signal output qq;
    signal output rr;
    (qq, rr) <== DivMod()(x, 10);
}
component main = Main();
"""
    cc = compile_source(src)
    w = cc.witness_host({"x": 47})
    assert w[1] == 4 and w[2] == 7


def test_anonymous_in_loop():
    src = """
pragma circom 2.0.0;
template Sq() {
    signal input in;
    signal output out;
    out <== in * in;
}
template Main(n) {
    signal input x;
    signal t[n+1];
    signal output out;
    t[0] <== x;
    for (var i = 0; i < n; i++) {
        t[i+1] <== Sq()(t[i]);
    }
    out <== t[n];
}
component main = Main(3);
"""
    cc = compile_source(src)
    w = cc.witness_host({"x": 2})
    assert w[1] == 2 ** 8  # ((2^2)^2)^2


def test_tuple_var_assignment():
    src = """
pragma circom 2.0.0;
template T() {
    signal input x;
    signal output out;
    var (a, b) = (x + 1, 3);
    out <== a * b;
}
component main = T();
"""
    cc = compile_source(src)
    w = cc.witness_host({"x": 4})
    assert w[1] == 15


def test_underscore_in_tuple():
    src = """
pragma circom 2.0.0;
template TwoOut() {
    signal input in;
    signal output a;
    signal output b;
    a <== in + 1;
    b <== in + 2;
}
template Main() {
    signal input x;
    signal output out;
    (out, _) <== TwoOut()(x);
}
component main = Main();
"""
    cc = compile_source(src)
    w = cc.witness_host({"x": 10})
    assert w[1] == 11


def test_anonymous_in_function_rejected():
    src = """
pragma circom 2.0.0;
template Id() { signal input in; signal output out; out <== in; }
function f(x) { return Id()(x); }
template Main() { signal input x; signal output out; out <== f(x); }
component main = Main();
"""
    with pytest.raises(ReportCollection):
        compile_source(src)
