"""Static unknown/known analysis (reference:
type_analysis/src/analyzers/unknown_known_analysis.rs) with the
reference's error codes (error_code.rs:155-239)."""

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.utils.reports import ReportCollection

PRIME = "goldilocks"


def codes_of(src):
    try:
        compile_source(src, prime=PRIME)
        return []
    except ReportCollection as rc:
        return [r.code for r in rc.reports]


def wrap(body, sig="signal input a; signal output b;"):
    return (f"pragma circom 2.0.0;\ntemplate T() {{ {sig}\n{body}\n}}\n"
            "component main = T();")


def test_unreachable_constraints_if():
    assert "T2005" in codes_of(wrap(
        "if (a == 5) { b <== 3; } else { b <== 4; }"))


def test_unreachable_constraints_while():
    assert "T2005" in codes_of(wrap(
        "var i = 0; while (i < a) { i += 1; b === i; } b <== 1;"))


def test_unreachable_signal_declaration():
    assert "T2050" in codes_of(wrap("if (a == 1) { signal s; } b <== a;"))


def test_unknown_dimension():
    assert "T20460" in codes_of(wrap(
        "var n = a * 2; signal tmp[n]; b <== 1;"))


def test_unknown_template_parameter():
    src = """
    pragma circom 2.0.0;
    template Inner(n) { signal input x; signal output y; y <== x * n; }
    template T() { signal input a; signal output b;
      component c = Inner(a);
      c.x <== a; b <== c.y;
    }
    component main = T();
    """
    assert "T20461" in codes_of(src)


def test_unknown_component_array_index_constraint():
    src = """
    pragma circom 2.0.0;
    template Inner() { signal input x; signal output y; y <== x; }
    template T() { signal input a; signal output b;
      component c[2];
      c[0] = Inner(); c[1] = Inner();
      c[a].x <== a;
      b <== 1;
    }
    component main = T();
    """
    # constrained store through an unknown component index is statically
    # non-quadratic
    assert "T20462" in codes_of(src)


def test_static_nonquadratic_unknown_index():
    assert "T20462" in codes_of(wrap(
        "signal arr[2]; arr[0] <== 1; arr[1] <== a; b <== arr[a];"))


def test_var_turned_unknown_propagates():
    # x is unknown after assignment from a signal; using it as a
    # condition guarding a constraint is rejected
    assert "T2005" in codes_of(wrap(
        "var x = a; if (x == 1) { b <== 1; } else { b <== 2; }"))


def test_var_requalified_known():
    # scalar vars regain Known when reassigned a known value
    src = wrap("var x = a; x = 3; signal s[x]; s[0] <== 1; "
               "s[1]<==1; s[2]<==1; b <== a;")
    assert codes_of(src) == []


def test_known_loop_accumulator_ok():
    src = """
    pragma circom 2.0.0;
    template T(n) { signal input a; signal output b;
      var acc = 0;
      for (var i = 0; i < n; i++) { acc += i; }
      b <== a * acc;
    }
    component main = T(4);
    """
    assert codes_of(src) == []


def test_witness_assignment_with_unknowns_ok():
    # `<--` may freely use unknown indices/conditions
    src = wrap("signal arr[2]; arr[0] <== 1; arr[1] <== a;"
               "b <-- (a == 1) ? arr[a] : 7; b*0 === 0;")
    assert codes_of(src) == []


def test_unknown_tag_assignment():
    src = """
    pragma circom 2.0.0;
    template T() { signal input a; signal output {t} b;
      b.t = a;
      b <== a;
    }
    component main = T();
    """
    assert "T2062" in codes_of(src)
