"""Static analysis battery: error reporting with stable codes."""

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.utils.reports import ReportCollection


def expect_code(src, code):
    with pytest.raises(ReportCollection) as ei:
        compile_source(src)
    codes = {r.code for r in ei.value.reports}
    assert code in codes, f"expected {code}, got {codes}"


def test_template_cannot_return():
    expect_code("""
pragma circom 2.0.0;
template T() { signal input a; return a; }
component main = T();
""", "T2015")


def test_function_all_paths_return():
    expect_code("""
pragma circom 2.0.0;
function f(x) { if (x > 0) { return 1; } }
template T() { signal input a; signal output b; b <== a * f(1); }
component main = T();
""", "T2015")


def test_function_no_signals():
    expect_code("""
pragma circom 2.0.0;
function f(x) { signal s; return x; }
template T() { signal input a; signal output b; b <== a * f(1); }
component main = T();
""", "T2016")


def test_unknown_call():
    expect_code("""
pragma circom 2.0.0;
template T() { signal input a; signal output b; b <== nosuch(a); }
component main = T();
""", "T2002")


def test_call_arity():
    expect_code("""
pragma circom 2.0.0;
function f(x, y) { return x + y; }
template T() { signal input a; signal output b; b <== a * f(1); }
component main = T();
""", "T2012")


def test_undeclared_symbol():
    expect_code("""
pragma circom 2.0.0;
template T() { signal input a; signal output b; b <== a * zz; }
component main = T();
""", "T2005")


def test_custom_gate_requires_pragma():
    expect_code("""
pragma circom 2.0.0;
template custom CG() { signal input a; signal output b; b <-- a; }
template T() { signal input x; signal output y; y <== x; }
component main = T();
""", "CG04")


def test_custom_gate_no_subcomponents():
    expect_code("""
pragma circom 2.0.6;
pragma custom_templates;
template Inner() { signal input a; signal output b; b <-- a; }
template custom CG() {
    signal input a;
    signal output b;
    component i = Inner();
    b <-- a;
}
template T() { signal input x; signal output y; y <== x; }
component main = T();
""", "CG03")


def test_main_public_must_be_input():
    expect_code("""
pragma circom 2.0.0;
template T() { signal input a; signal output b; b <== a; }
component main {public [nope]} = T();
""", "T2009")


def test_constraint_in_function():
    expect_code("""
pragma circom 2.0.0;
function f(x) { x === 1; return x; }
template T() { signal input a; signal output b; b <== a * f(1); }
component main = T();
""", "T2039")


def test_var_unknown_dimension_reported():
    """var v[a] with signal-dependent a reports T20460 at analysis time
    (unknown_known_analysis.rs:136-150 checks every declaration kind)."""
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal output o;
    var v[a];
    o <== a;
}
component main = T();
"""
    with pytest.raises(Exception) as ei:
        compile_source(src)
    assert "T20460" in str(getattr(ei.value, "reports", ei.value)) or \
        any(r.code == "T20460" for r in getattr(ei.value, "reports", []))


def test_unreached_template_not_analyzed():
    """Templates unreachable from main are pruned before semantic
    analyses (check_types.rs:57-71): an unknown-dependent construct in
    a dead template must not error."""
    src = """
pragma circom 2.0.0;
template Dead() {
    signal input a;
    signal output o;
    var v[a];
    o <== a;
}
template T() {
    signal input x;
    signal output y;
    y <== x + 1;
}
component main = T();
"""
    cc = compile_source(src)
    assert cc.witness_host({"x": 3})[1] == 4
