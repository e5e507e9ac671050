"""Static dimension/type analysis (reference type_check.rs:83-1564).

Errors must surface at ANALYSIS time — including in branches the
executor never reaches and with the whole battery reported at once —
with the reference's stable codes (error_code.rs).
"""

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.utils.reports import ReportCollection


def codes_of(src):
    with pytest.raises(ReportCollection) as ei:
        compile_source(src)
    return [r.code for r in ei.value.reports]


def test_dead_branch_dimension_error_is_static():
    # the executor never runs the if-branch; the static pass must
    src = """
pragma circom 2.0.0;
template T() {
    signal input x;
    signal output y;
    var v[2][3];
    if (0 == 1) {
        y <== v[0][1][2];
    }
    y <== x;
}
component main = T();
"""
    assert "T2032" in codes_of(src)


def test_array_operand_in_arithmetic():
    src = """
pragma circom 2.0.0;
template T() {
    signal input x;
    signal output y;
    var v[2];
    if (0 == 1) { var w = v + 1; }
    y <== x;
}
component main = T();
"""
    assert "T2028" in codes_of(src)  # InfixOperatorWithWrongTypes


def test_ternary_branch_dims_mismatch():
    src = """
pragma circom 2.0.0;
function f(n) {
    var a[2] = [1, 2];
    return n > 0 ? a : 3;
}
template T() {
    signal input x;
    signal output y;
    var q[2] = f(1);
    y <== x;
}
component main = T();
"""
    assert "T2019" in codes_of(src)


def test_assignment_dims_mismatch():
    src = """
pragma circom 2.0.0;
template T() {
    signal input x;
    signal output y;
    var v[2];
    if (0 == 1) { v = 5; }
    y <== x;
}
component main = T();
"""
    assert "T2061" in codes_of(src)


def test_function_inconsistent_returns():
    src = """
pragma circom 2.0.0;
function g(n) {
    if (n > 0) { return [1, 2]; }
    return 3;
}
template T() {
    signal input x;
    signal output y;
    var q = g(0);
    y <== x;
}
component main = T();
"""
    assert "T2013" in codes_of(src)


def test_main_with_tagged_inputs():
    src = """
pragma circom 2.0.0;
template T() {
    signal input {binary} x;
    signal output y;
    y <== x;
}
component main = T();
"""
    assert "T2051" in codes_of(src)


def test_batch_reporting():
    """The whole battery reports at once (reference prints all type
    errors before exiting), not one-at-a-time at execution."""
    src = """
pragma circom 2.0.0;
template T() {
    signal input x;
    signal output y;
    var v[2];
    if (0 == 1) {
        var a = v + 1;
        var b = v[0][1];
    }
    y <== x;
}
component main = T();
"""
    cs = codes_of(src)
    assert "T2028" in cs and "T2032" in cs


def test_uninstantiated_template_still_checked():
    """Unlike the unknown/known pass (which mirrors dead-template
    pruning), reachability is from main's CALL GRAPH: a template
    reachable but conditionally uninstantiated is still checked."""
    src = """
pragma circom 2.0.0;
template Inner() {
    signal input a;
    signal output o;
    var v[2];
    if (0 == 1) { o <== v[1][2]; }
    o <== a;
}
template T(n) {
    signal input x;
    signal output y;
    if (n == 0) {
        y <== x;
    } else {
        component c = Inner();
        c.a <== x;
        y <== c.o;
    }
}
component main = T(0);
"""
    assert "T2032" in codes_of(src)


def test_component_io_dims_checked():
    src = """
pragma circom 2.0.0;
template Inner() {
    signal input a[3];
    signal output o;
    o <== a[0];
}
template T() {
    signal input x;
    signal output y;
    component c = Inner();
    if (0 == 1) { c.a[0][1] <== x; }
    c.a[0] <== x; c.a[1] <== x; c.a[2] <== x;
    y <== c.o;
}
component main = T();
"""
    assert "T2032" in codes_of(src)


def test_valid_circuits_pass():
    src = (open("circom_tpu/circuits/sha256.circom").read()
           + "\ncomponent main = Sha256Block();\n")
    cc = compile_source(src)  # no ReportCollection raised
    assert cc is not None


def test_static_tag_typing_in_dead_branch():
    """Tag-access typing is STATIC and covers unexecuted code
    (type_check.rs:83-1564 parity, VERDICT r2 item 8): an undeclared
    tag and an outside input-tag read inside `if (0 == 1)` both report
    at analysis time."""
    src = """
pragma circom 2.0.0;
template B(){ signal input {u} i; signal output {t} o; o.t = 1; o <== i; }
template T() {
    signal input x;
    signal output y;
    signal {m} s;
    component c = B();
    if (0 == 1) {
        var a = s.nosuchtag;    // T2048: tag not declared
        var b2 = c.i.u;         // T2048-C: input tag outside
    }
    s <== x;
    c.i <== x;  // (tag requirement is dynamic; not reached here)
    y <== c.o;
}
component main = T();
"""
    cs = codes_of(src)
    assert "T2048" in cs and "T2048-C" in cs


def test_static_tag_write_outside_in_dead_branch():
    src = """
pragma circom 2.0.0;
template B(){ signal input {u} i; signal output {t} o; o.t = 1; o <== i; }
template T() {
    signal input x;
    signal output y;
    component c = B();
    if (0 == 1) {
        c.o.t = 5;   // T2048-A
        c.i.u = 5;   // T2048-B
    }
    y <== x;
}
component main = T();
"""
    cs = codes_of(src)
    assert "T2048-A" in cs and "T2048-B" in cs


def test_static_bus_field_typing_in_dead_branch():
    """Bus-field access through component boundaries, statically, in
    dead branches: a nonexistent field/tag reports T2048."""
    src = """
pragma circom 2.0.0;
bus Pt(){ signal xx; signal yy; }
template T() {
    signal input x;
    signal output y;
    Pt() p;
    p.xx <== x; p.yy <== x;
    if (0 == 1) {
        var a = p.zz;        // T2048: no such field or tag
        var b2 = p.xx[1];    // T2032: scalar field indexed
    }
    y <== x;
}
component main = T();
"""
    cs = codes_of(src)
    assert "T2048" in cs and "T2032" in cs


def test_unable_to_type_function_t2004():
    """Mutually recursive functions whose return type never resolves:
    the reference's type_given_function returns None and the call site
    reports UnableToTypeFunction (type_check.rs:1441-1449)."""
    src = """
pragma circom 2.0.0;
function f(n) { return g(n); }
function g(n) { return f(n); }
template T() {
    signal output o;
    o <== f(3);
}
component main = T();
"""
    assert "T2004" in codes_of(src)


def test_resolvable_recursion_no_t2004():
    """Recursion with a base case resolves (reference infers type 0);
    no T2004."""
    src = """
pragma circom 2.0.0;
function fact(n) {
    if (n == 0) { return 1; }
    return n * fact(n - 1);
}
template T() {
    signal output o;
    o <== fact(4);
}
component main = T();
"""
    from circom_tpu.compiler.pipeline import compile_source as cs
    cc = cs(src)
    assert cc.witness_host({})[1] == 24


def test_bus_field_misuse_through_component_dead_branch():
    """Bus-field typing THROUGH a component boundary, in a branch the
    executor never reaches (type_check.rs bus typing over component
    io): nonexistent field on a subcomponent's bus output -> T2048;
    nested valid access passes."""
    src = """
pragma circom 2.0.0;
bus In2(){ signal re; signal im; }
bus Pt(){ signal xx; In2() n; }
template Sub() {
    signal input a;
    output Pt() p;
    p.xx <== a; p.n.re <== a; p.n.im <== a + 1;
}
template T() {
    signal input x;
    signal output y;
    component s = Sub();
    s.a <== x;
    if (0 == 1) {
        var q = s.p.zz;      // T2048: Pt declares no field zz
        var r2 = s.p.n.ww;   // T2048: nested bus field missing
    }
    y <== s.p.n.re;          // valid nested access through component
}
component main = T();
"""
    cs = codes_of(src)
    assert cs.count("T2048") >= 2, cs


def test_bus_field_tag_through_component():
    """A declared tag on a bus FIELD is accessible (scalar); an
    undeclared one reports T2048 — both through the component
    (the reference constructs only InvalidTagAccess, type_check.rs:1330)."""
    src = """
pragma circom 2.0.0;
bus Pt(){ signal {binary} xx; }
template Sub() {
    signal input a;
    output Pt() p;
    p.xx <== a * 0;
}
template T() {
    signal input x;
    signal output y;
    component s = Sub();
    s.a <== x;
    if (0 == 1) {
        var t2 = s.p.xx.nope;  // T2048: xx declares no tag `nope`
    }
    y <== x;
}
component main = T();
"""
    assert "T2048" in codes_of(src)
