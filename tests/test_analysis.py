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
""", "T2024")


def test_function_all_paths_return():
    expect_code("""
pragma circom 2.0.0;
function f(x) { if (x > 0) { return 1; } }
template T() { signal input a; signal output b; b <== a * f(1); }
component main = T();
""", "T2014")


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
""", "T2001")


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
""", "T2021")


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


def test_cg01_warnings_dropped_when_custom_gate_errors():
    """The reference's custom_gate_analysis returns Err(errors) and drops
    CG01 warnings when CG02/CG03 errors exist
    (custom_gate_analysis.rs:137-151)."""
    src = """
pragma circom 2.0.6;
pragma custom_templates;
template custom CG() {
    signal input a;
    signal inter;       // CG01 warning candidate
    signal output b;
    inter <== a;        // CG02 error
    b <-- a;
}
template T() { signal input x; signal output y; y <== x; }
component main = T();
"""
    with pytest.raises(ReportCollection) as ei:
        compile_source(src)
    codes = [r.code for r in ei.value.reports]
    assert "CG02" in codes
    assert "CG01" not in codes


def test_cg01_warning_survives_clean_custom_gate():
    src = """
pragma circom 2.0.6;
pragma custom_templates;
template custom CG() {
    signal input a;
    signal inter;       // CG01 warning
    signal output b;
    b <-- a;
}
template T() { signal input x; signal output y; y <== x; }
component main = T();
"""
    cc = compile_source(src)
    assert cc is not None  # warnings do not abort compilation


def test_cg05_no_pragma_wording():
    """Custom templates in a file with NO `pragma circom` get the
    reference's distinct no-pragma message (parser/lib.rs:244-258),
    not the 'requires at least version' wording — only observable when
    the compiler version is < 2.0.6, which ours is not; assert the
    versioned wording picks the FILE version when present."""
    src = """
pragma circom 2.0.0;
pragma custom_templates;
template custom CG() { signal input a; signal output b; b <-- a; }
template T() { signal input x; signal output y; y <== x; }
component main = T();
"""
    with pytest.raises(ReportCollection) as ei:
        compile_source(src)
    msgs = [r.message for r in ei.value.reports if r.code == "CG05"]
    assert msgs and "requires at least version 2.0.6" in msgs[0]
    assert "currently 2.0.0" in msgs[0]
