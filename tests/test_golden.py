"""Golden tests against reference-DOCUMENTED outputs.

The reference publishes exact expected artifacts for one worked circuit
at every optimization level:

* `.sym` lines       — mkdocs/docs/circom-language/formats/sym.md:46-95
* constraints JSON   — formats/constraints-json.md:28-103
* substitutions JSON — formats/simplification-json.md:22-95

With no Rust toolchain in this environment these documented bytes are
the only available external ground truth; everything else in tests/
checks self-consistency (host-vs-TPU, roundtrips).  The circuit is the
docs' `symbols.circom`/`basic.circom`/`simplify.circom` (same source).
"""

import json

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.emit.json_out import constraints_json, substitutions_json

SRC = """
pragma circom 2.0.0;

template Internal() {
   signal input in[2];
   signal output out;
   out <== in[0]*in[1];
}

template Main() {
   signal input in[2];
   signal output out;
   component c = Internal ();
   c.in[0] <== in[0];
   c.in[1] <== in[1]+2*in[0]+1;
   c.out ==> out;
}
"""

# bn128 prime - 1 (the coefficient "-1" in the docs' dumps)
M1 = ("21888242871839275222246405745257275088548364400416034343698"
      "204186575808495616")


def _cc(level):
    return compile_source(SRC + "\ncomponent main = Main();\n",
                          simplification=level)


def test_sym_o1_golden():
    """sym.md:46-53 — two signals eliminated under default --O1."""
    assert _cc("O1").sym_lines() == [
        "1,1,1,main.out",
        "2,2,1,main.in[0]",
        "3,3,1,main.in[1]",
        "4,-1,0,main.c.out",
        "5,-1,0,main.c.in[0]",
        "6,4,0,main.c.in[1]",
    ]


def test_sym_o0_golden():
    """sym.md:62-69 — no simplification, identity witness map."""
    assert _cc("O0").sym_lines() == [
        "1,1,1,main.out",
        "2,2,1,main.in[0]",
        "3,3,1,main.in[1]",
        "4,4,0,main.c.out",
        "5,5,0,main.c.in[0]",
        "6,6,0,main.c.in[1]",
    ]


def test_sym_o2_golden():
    """sym.md:78-95 — full simplification removes all internals."""
    assert _cc("O2").sym_lines() == [
        "1,1,1,main.out",
        "2,2,1,main.in[0]",
        "3,3,1,main.in[1]",
        "4,-1,0,main.c.out",
        "5,-1,0,main.c.in[0]",
        "6,-1,0,main.c.in[1]",
    ]


def _constraints(level):
    cc = _cc(level)
    return json.loads(constraints_json(cc.r1cs_rows()))["constraints"]


def test_constraints_json_o1_golden():
    """constraints-json.md:49-59 (O1: one nonlinear + one linear)."""
    assert _constraints("O1") == [
        [{"2": M1}, {"4": "1"}, {"1": M1}],
        [{}, {}, {"0": "1", "2": "2", "3": "1", "4": M1}],
    ]


def test_constraints_json_o0_golden():
    """constraints-json.md:68-80 (O0: all four raw constraints)."""
    assert _constraints("O0") == [
        [{}, {}, {"2": "1", "5": M1}],
        [{}, {}, {"0": "1", "2": "2", "3": "1", "6": M1}],
        [{}, {}, {"1": M1, "4": "1"}],
        [{"5": M1}, {"6": "1"}, {"4": M1}],
    ]


def test_constraints_json_o2_golden():
    """constraints-json.md:88-96 (O2: single folded constraint)."""
    assert _constraints("O2") == [
        [{"2": M1}, {"0": "1", "2": "2", "3": "1"}, {"1": M1}],
    ]


def _subs(level):
    cc = _cc(level)
    subs = {} if cc.simplified is None else cc.simplified.substitutions
    return json.loads(substitutions_json(subs))


def test_substitutions_json_o1_golden():
    """simplification-json.md:43-52."""
    assert _subs("O1") == {"5": {"2": "1"}, "4": {"1": "1"}}


def test_substitutions_json_o0_golden():
    """simplification-json.md:61-67 — empty dictionary."""
    assert _subs("O0") == {}


def test_substitutions_json_o2_golden():
    """simplification-json.md:77-95."""
    assert _subs("O2") == {
        "5": {"2": "1"},
        "4": {"1": "1"},
        "6": {"0": "1", "2": "2", "3": "1"},
    }
