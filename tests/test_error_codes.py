"""Stable error codes matched to the reference table
(program_structure/src/program_library/error_code.rs:137-259), each
asserted with its source span (round-3 breadth pass; PARITY.md lists
the deliberately merged/dead variants)."""

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.compiler.values import ExecError
from circom_tpu.utils.reports import Report, ReportCollection


def reports_of(src, prime="bn128", **kw):
    try:
        cc = compile_source(src, prime=prime, **kw)
    except (Report, ReportCollection) as r:
        return list(r.reports) if hasattr(r, "reports") else [r]
    except ExecError as e:
        return [e.report]
    return []


def expect(src, code, **kw):
    reps = reports_of(src, **kw)
    codes = [r.code for r in reps]
    assert code in codes, f"expected {code}, got {codes}"
    rep = next(r for r in reps if r.code == code)
    assert rep.primary, f"{code} report carries no source span"
    return rep


T = "pragma circom 2.0.0;\n"


def test_p1009_unrecognized_include():
    expect(T + 'include 42;\ntemplate A(){signal input x;}'
               '\ncomponent main = A();', "P1009")


def test_p1015_expected_identifier():
    expect(T + 'template 5(){}\ncomponent main = X();', "P1015")


def test_t2035_for_ill_constructed():
    expect(T + '''template A(){
  signal input x; signal output y;
  for (x + 1; x < 5; x) { }
  y <== x;
}
component main = A();''', "T2035")


def test_t2024_template_return_and_t2014_path():
    expect(T + 'template A(){signal input x; return x;}'
               '\ncomponent main = A();', "T2024")
    expect(T + 'function f(x){ if (x > 0) { return 1; } }'
               '\ntemplate A(){signal input x; signal output y;'
               ' y <== x * f(1);}\ncomponent main = A();', "T2014")


def test_t2001_unknown_function_call():
    expect(T + 'template A(){signal input x; signal output y;'
               ' y <== nosuch(x);}\ncomponent main = A();', "T2001")


def test_t2021_nonexistent_symbol():
    expect(T + 'template A(){signal input x; signal output y;'
               ' y <== zz;}\ncomponent main = A();', "T2021")


def test_t2011_signal_in_while_scope():
    expect(T + '''template A(){
  signal input x; signal output y;
  var i = 0;
  while (i < 2) { signal s; i += 1; }
  y <== x;
}
component main = A();''', "T2011")


def test_t2011_signal_in_if_scope_allowed():
    assert reports_of(T + '''template A(n){
  signal input x; signal output y;
  if (n == 1) { signal s; s <== x * x; y <== s; }
  else { y <== x; }
}
component main = A(1);''') == []


def test_t2025_array_condition():
    expect(T + '''template A(){
  signal input x; signal output y;
  var v[2] = [1, 2];
  if (v) { y <== x; } else { y <== 0; }
}
component main = A();''', "T2025")


def test_t2026_empty_inline_array():
    expect(T + '''template A(){
  signal input x; signal output y;
  var v[1] = [];
  y <== x;
}
component main = A();''', "T2026")


def test_t2027_t2028_operator_with_array():
    expect(T + '''template A(){
  signal input x; signal output y;
  var v[2] = [1, 2];
  y <== x + v;
}
component main = A();''', "T2028")
    expect(T + '''template A(){
  signal input x; signal output y;
  var v[2] = [1, 2];
  y <== x + (-v);
}
component main = A();''', "T2027")


def test_t2029_template_as_call_argument():
    expect(T + '''template B(n){signal input x; signal output y; y<==x;}
function f(v){ return v; }
template A(){
  signal input x; signal output y;
  component c = B(f(B(1)));
  c.x <== x; y <== c.y;
}
component main = A();''', "T2029")


def test_t2036_component_instantiated_twice():
    expect(T + '''template B(){signal input x; signal output y; y<==x;}
template A(){
  signal input x; signal output y;
  component c = B();
  c = B();
  c.x <== x; y <== c.y;
}
component main = A();''', "T2036")


def test_t2037_signal_assigned_twice():
    expect(T + '''template A(){
  signal input x; signal output y;
  y <-- x;
  y <-- x + 1;
  y*0 === 0;
}
component main = A();''', "T2037")


def test_t2040_missing_required_tag():
    expect(T + '''template B(){signal input {binary} b;
  signal output y; y <== b;}
template A(){
  signal input x; signal output y;
  component c = B();
  c.b <== x;
  y <== c.y;
}
component main = A();''', "T2040")


def test_t2042_unknown_index_and_t20463_array_length():
    expect(T + '''template A(){
  signal input x; signal output y;
  signal s[3];
  s[x] <-- 1;
  y <== x;
}
component main = A();''', "T2042")
    expect(T + '''template A(){
  signal input x; signal output y;
  var v[x];
  y <== x;
}
component main = A();''', "T20460")
    expect(T + '''function g(n){ var v[n]; v[0] = 1; return v[0]; }
template A(){
  signal input x; signal output y;
  y <-- g(x);
  y*0 === 0;
}
component main = A();''', "T20463")


def test_t2033_t2053_invalid_array_size():
    expect(T + '''template A(){
  signal input x; signal output y;
  signal s[0 - 1];
  y <== x;
}
component main = A();''', "T2033")
    expect(T + '''bus B(){ signal f; }
template A(){
  signal input x; signal output y;
  B() b[0 - 2];
  y <== x;
}
component main = A();''', "T2053")


def test_t2045_dimension_mismatch():
    expect(T + '''template A(){
  signal input x[2]; signal output y[3];
  y <== x;
}
component main = A();''', "T2045")


def test_t2048a_b_c_tag_access_outside():
    base = '''template Src(){ signal output {u} s; s.u = 2; s <== 1; }
template B(){signal input {u} i; signal output {t} o;
  o.t = 1; o <== i;}
template A(){
  signal input x; signal output y;
  component sc = Src();
  component c = B();
  %s
}
component main = A();'''
    expect(T + base % "c.i <== sc.s; c.o.t = 3; y <== c.o;", "T2048-A")
    expect(T + base % "c.i.u = 3; c.i <== sc.s; y <== c.o;", "T2048-B")
    # reading an input tag from outside: the static type check reports
    # T2048-C (InputTagCannotBeAccessedOutside, type_check.rs parity);
    # the executor keeps a runtime backstop
    expect(T + base % "c.i <== sc.s; y <== x + c.i.u;", "T2048-C")


def test_t2054_t2055_wrong_assign_operators():
    expect(T + '''template A(){
  signal input x; signal output y;
  y = x;
}
component main = A();''', "T2054")
    expect(T + '''template A(){
  signal input x; signal output y;
  var v = 0;
  v <== x;
  y <== x;
}
component main = A();''', "T2055")


def test_t2034_array_of_templates():
    expect(T + '''template B(){signal input x; signal output y; y<==x;}
template A(){
  signal input x; signal output y;
  var v[2] = [B(), B()];
  y <== x;
}
component main = A();''', "T2034")



def test_t2059_bus_to_signal_and_bu05_different_bus():
    expect(T + '''bus B(){ signal f; }
template A(){
  signal input x; signal output y;
  B() b;
  b.f <== x;
  signal s;
  s <== b;
  y <== s;
}
component main = A();''', "T2059")
    expect(T + '''bus B1(){ signal f; }
bus B2(){ signal g; }
template A(){
  signal input x; signal output y;
  B1() input_side;
  input_side.f <== x;
  B2() other;
  other <== input_side;
  y <== x;
}
component main = A();''', "BU05")


def test_bu01_bu02_bu03_bu06_bus_instantiation():
    expect(T + '''bus B(n){ signal f[n]; }
template A(){
  signal input x; signal output y;
  B(1, 2) b;
  y <== x;
}
component main = A();''', "BU01")
    expect(T + '''bus B(){ signal f; }
template A(){
  signal input x; signal output y;
  component c = B();
  y <== x;
}
component main = A();''', "BU02")
    # `B() b;` with B a template: the bus-type symbol check reports
    # UndefinedBus (T2052), the reference's code for bus-position
    # misuse; BU03 remains the executor's backstop for a pending bus
    # assigned a template call
    expect(T + '''template B(){signal input x; signal output y; y<==x;}
template A(){
  signal input x; signal output y;
  B() b;
  y <== x;
}
component main = A();''', "T2052")


def test_component_assigned_expression():
    expect(T + '''template A(){
  signal input x; signal output y;
  component c = x + 1;
  y <== x;
}
component main = A();''', "T20461")


def test_t20465_t20466_runtime_component_errors():
    expect(T + '''template B(n){signal input x; signal output y; y<==x;}
component main = B();''', "T20465")
    expect(T + '''template B(){signal input x; signal output y; y<==x;}
template A(){
  signal input x; signal output y;
  component c;
  c.x <== x;
  y <== x;
}
component main = A();''', "T20466")


def test_t2063_t20464_main_errors():
    expect(T + 'component main = 5;', "T2063")


def test_tac02_tuple_errors():
    expect(T + '''template A(){
  signal input x; signal output y;
  var a; var b;
  (a, b) = (x, x + 1, x + 2);
  y <== x;
}
component main = A();''', "TAC02")
