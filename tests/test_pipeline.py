"""End-to-end pipeline tests on the documentation circuits.

multiplier2 is the reference docs' hello-world
(mkdocs/docs/getting-started/writing-circuits.md); the 3-multiplier
composition exercises subcomponents, and further tests cover functions,
loops, arrays and witness-hint code (<-- with bit ops).
"""

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.emit.binfmt import (field_size_bytes, read_r1cs, read_wtns,
                                    write_r1cs, write_wtns)
from circom_tpu.field.primes import field_spec

P = field_spec("bn128").p

MULTIPLIER2 = """
pragma circom 2.0.0;
template Multiplier2 {
    signal input a;
    signal input b;
    signal output c;
    c <== a*b;
}
component main = Multiplier2();
"""


def test_multiplier2_constraints():
    cc = compile_source(MULTIPLIER2, simplification="O0")
    rows = cc.r1cs_rows()
    assert len(rows) == 1
    a, b, c = rows[0]
    # c(=wire 1) <== a(2) * b(3):  (-a)*(b) - (-c) = 0 modulo sign choices
    assert set(a.keys()) == {2} and set(b.keys()) == {3}
    assert set(c.keys()) == {1}
    # wires: 0 const, 1 = output c, 2 = a, 3 = b
    assert cc.dag.total_signals() == 4
    n_out, n_pub_in, n_prv_in = cc.dag.public_info()
    assert (n_out, n_pub_in, n_prv_in) == (1, 0, 2)


def test_multiplier2_sym():
    cc = compile_source(MULTIPLIER2, simplification="O0")
    assert cc.sym_lines() == [
        "1,1,0,main.c",
        "2,2,0,main.a",
        "3,3,0,main.b",
    ]


def test_multiplier2_witness():
    cc = compile_source(MULTIPLIER2)
    w = cc.witness_host({"a": 3, "b": 11})
    assert w == [1, 33, 3, 11]


def test_multiplier2_wtns_roundtrip(tmp_path):
    cc = compile_source(MULTIPLIER2)
    w = cc.witness_host({"a": 3, "b": 11})
    f = tmp_path / "w.wtns"
    write_wtns(str(f), P, w)
    back = read_wtns(str(f))
    assert back["p"] == P and back["values"] == w
    assert back["n8"] == 32


def test_multiplier2_r1cs_roundtrip(tmp_path):
    cc = compile_source(MULTIPLIER2)
    f = tmp_path / "c.r1cs"
    cc.write_r1cs(str(f))
    data = read_r1cs(str(f))
    assert data["p"] == P
    assert data["n_wires"] == 4
    assert data["n_pub_out"] == 1
    assert data["n_prv_in"] == 2
    assert len(data["constraints"]) == 1


MULTIPLIER3 = """
pragma circom 2.0.0;
template Multiplier2() {
    signal input a;
    signal input b;
    signal output c;
    c <== a*b;
}
template Multiplier3() {
    signal input in1;
    signal input in2;
    signal input in3;
    signal output out;
    component m1 = Multiplier2();
    component m2 = Multiplier2();
    m1.a <== in1;
    m1.b <== in2;
    m2.a <== m1.c;
    m2.b <== in3;
    out <== m2.c;
}
component main = Multiplier3();
"""


def test_multiplier3():
    cc = compile_source(MULTIPLIER3, simplification="O0")
    # nodes: Multiplier2 (memoized once) + Multiplier3
    assert len(cc.dag.nodes) == 2
    w = cc.witness_host({"in1": 2, "in2": 3, "in3": 5})
    # witness: [1, out, in1, in2, in3, m1.c, m1.a, m1.b, m2.c, m2.a, m2.b]
    assert w[0] == 1 and w[1] == 30
    assert len(w) == cc.dag.total_signals()
    rows = cc.r1cs_rows()
    # m1.a<==in1, m1.b<==in2, m2.a<==m1.c, m2.b<==in3, out<==m2.c are
    # linear; c<==a*b in each Multiplier2 instance is quadratic: total 7
    assert len(rows) == 7
    assert sum(1 for (a, b, _c) in rows if a or b) == 2


def test_loops_and_arrays():
    src = """
pragma circom 2.0.0;
template Sum(n) {
    signal input in[n];
    signal output out;
    var acc = 0;
    for (var i = 0; i < n; i++) {
        acc += in[i];
    }
    out <== acc;
}
component main = Sum(5);
"""
    cc = compile_source(src)
    w = cc.witness_host({"in": [1, 2, 3, 4, 5]})
    assert w[1] == 15
    assert len(cc.r1cs_rows()) == 1  # one linear constraint


def test_functions():
    src = """
pragma circom 2.0.0;
function nbits(a) {
    var n = 1;
    var r = 0;
    while (n-1 < a) {
        r++;
        n *= 2;
    }
    return r;
}
template T() {
    signal input in;
    signal output out;
    out <== in * nbits(100);
}
component main = T();
"""
    cc = compile_source(src)
    w = cc.witness_host({"in": 2})
    assert w[1] == 14  # nbits(100) = 7, 2*7


def test_witness_hints_bit_ops():
    src = """
pragma circom 2.0.0;
template Num2Bits(n) {
    signal input in;
    signal output out[n];
    var lc1 = 0;
    var e2 = 1;
    for (var i = 0; i < n; i++) {
        out[i] <-- (in >> i) & 1;
        out[i] * (out[i] - 1) === 0;
        lc1 += out[i] * e2;
        e2 = e2 + e2;
    }
    lc1 === in;
}
component main = Num2Bits(8);
"""
    cc = compile_source(src)
    w = cc.witness_host({"in": 0b10110101})
    assert w[1:9] == [1, 0, 1, 0, 1, 1, 0, 1]
    assert len(cc.r1cs_rows()) == 9  # 8 bit checks + 1 sum


def test_sanity_check_catches_bad_hint():
    src = """
pragma circom 2.0.0;
template Bad() {
    signal input in;
    signal output out;
    out <-- in + 1;
    out === in + 2;
}
component main = Bad();
"""
    cc = compile_source(src)
    from circom_tpu.compiler.values import ExecError

    with pytest.raises(ExecError):
        cc.witness_host({"in": 5})


def test_ternary_and_known_if():
    src = """
pragma circom 2.0.0;
template T(n) {
    signal input in;
    signal output out;
    var k = n > 3 ? 10 : 20;
    if (n == 5) { k += 1; }
    out <== in * k;
}
component main = T(5);
"""
    cc = compile_source(src)
    w = cc.witness_host({"in": 2})
    assert w[1] == 22


def test_multiplier3_O1_simplification():
    """O1 removes io-link equalities and compacts the witness
    (constraint_simplification.rs eq_simplification semantics)."""
    cc = compile_source(MULTIPLIER3)  # default O1
    w = cc.witness_host({"in1": 2, "in2": 3, "in3": 5})
    # wires: 1, out, in1, in2, in3, m1.c   (m1/m2 io aliased away)
    assert w == [1, 30, 2, 3, 5, 6]
    rows = cc.r1cs_rows()
    assert len(rows) == 2
    assert all(a and b for (a, b, _c) in rows)  # both quadratic
    c = cc.counts()
    assert c["n_wires"] == 6 and c["n_labels"] == 11
    # sym: removed signals get witness -1
    syms = {l.split(",")[3]: int(l.split(",")[1]) for l in cc.sym_lines()}
    assert syms["main.m1.a"] == -1 and syms["main.in1"] == 2


def test_O2_linear_elimination():
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal input b;
    signal inter;
    signal output out;
    inter <== a + 2*b;
    out <== inter * inter;
}
component main = T();
"""
    cc1 = compile_source(src, simplification="O1")
    cc2 = compile_source(src, simplification="O2")
    # O1 keeps the linear definition of inter; O2 eliminates inter
    assert len(cc1.r1cs_rows()) == 2
    assert len(cc2.r1cs_rows()) == 1
    w1 = cc1.witness_host({"a": 3, "b": 4})
    w2 = cc2.witness_host({"a": 3, "b": 4})
    assert w1[1] == 121 and w2[1] == 121
    assert len(w2) == len(w1) - 1
    # the surviving quadratic constraint must hold over the O2 witness
    from circom_tpu.compiler.algebra import CONST
    (a, b, c), = cc2.r1cs_rows()
    P = cc2.p
    def ev(lc, w):
        return sum(v * (1 if k == CONST else 0) + (w[k] * v if k != CONST else 0)
                   for k, v in lc.items()) % P
    assert (ev(a, w2) * ev(b, w2) - ev(c, w2)) % P == 0


def test_parallel_simplification_deterministic():
    """--parallel (process-pool cluster solving, reference threadpool
    constraint_simplification.rs:198-327) must produce byte-identical
    artifacts to the sequential path."""
    from circom_tpu.circuits.gen_poseidon import generate as gen_poseidon

    src = (gen_poseidon((2,))
           + open("circom_tpu/circuits/merkle.circom").read()
             .replace("pragma circom 2.0.0;", "")
           + "\ncomponent main = MerkleInclusion(4);\n")
    seq = compile_source(src, simplification="O2")
    par = compile_source(src, simplification="O2", parallel=True)
    assert seq.r1cs_rows() == par.r1cs_rows()
    assert seq.counts() == par.counts()


def test_simplification_heuristics_strategies():
    """--use_old_simplification_heuristics switches the O2 Gauss
    strategy (largest-signal) vs the default least-occurrences for
    mid-size clusters (full_simplification dispatch,
    simplification_utils.rs:547-571).  Both must produce correct,
    equally-sized systems; the substitution choices differ."""
    from circom_tpu.compiler.algebra import Constraint
    from circom_tpu.compiler.simplify import (_gauss_cluster,
                                              _gauss_cluster_new,
                                              _gauss_solver_for)
    from circom_tpu.field.hostfield import HostField
    from circom_tpu.field.primes import field_spec

    hf = HostField(field_spec("goldilocks"))
    # occ(1)=1, occ(2)=2, occ(3)=1: on c1 the old strategy
    # eliminates the largest signal (2), the new strategy the
    # least-occurring one (1) -> different substitution sets.
    c1 = Constraint({}, {}, {1: 1, 2: 1, 0: 7})
    c2 = Constraint({}, {}, {2: 1, 3: 5})
    cluster = [c1, c2]
    subs_old, cons_old = _gauss_cluster(list(cluster), set(), hf)
    subs_new, cons_new = _gauss_cluster_new(list(cluster), set(), hf)
    assert len(cons_old) == len(cons_new) == 0
    assert {s.signal for s in subs_old} != {s.signal for s in subs_new}
    # dispatch rule: mid-size clusters use the new strategy by default
    big = [c1] * 400
    assert _gauss_solver_for(big, False) is _gauss_cluster_new
    assert _gauss_solver_for(big, True) is _gauss_cluster
    assert _gauss_solver_for([c1], False) is _gauss_cluster


def test_o2_constraint_count_regression():
    """Track O2 output size on Poseidon2 (divergence from these counts
    means the simplification behavior changed)."""
    from circom_tpu.circuits.gen_poseidon import generate

    src = generate((2,)) + "\ncomponent main = Poseidon2();\n"
    cc = compile_source(src, simplification="O2")
    assert len(cc.r1cs_rows()) == 237
    assert cc.counts()["n_wires"] == 240
    cc1 = compile_source(src, simplification="O1")
    assert len(cc1.r1cs_rows()) == 320
    assert cc1.counts()["n_wires"] == 323


def test_inspect_taxonomy():
    """--inspect distinguishes local signals (CA01) from subcomponent
    io signals (CA02) and groups arrays with examples
    (constraint_correctness_analysis.rs:73-173)."""
    src = """
pragma circom 2.0.0;
template Inner() {
    signal input a;
    signal output o;
    signal output unused_out;
    o <== a * a;
    unused_out <-- 5;
    unused_out * 0 === 0;
}
template T() {
    signal input x;
    signal output y;
    signal dead[3];
    for (var k = 0; k < 3; k++) { dead[k] <-- k; }
    component c = Inner();
    c.a <== x;
    y <== c.o;
}
component main = T();
"""
    cc = compile_source(src, simplification="O0")
    ws = cc.inspect()
    by_code = {}
    for w in ws:
        by_code.setdefault(w.code, []).append(w.message)
    assert any("unused_out" in m for m in by_code["CA01"])
    assert any("c.unused_out" in m and "father" in m
               for m in by_code["CA02"])
    assert any("Array of local signals dead" in m and "3 signals" in m
               for m in by_code["CA01"])


def test_verbose_logs_known_values(capsys):
    """--verbose prints log() arguments during constraint generation;
    signal-dependent values print Unknown (execute.rs:730-754)."""
    src = """
pragma circom 2.0.0;
template T(n) {
    signal input x;
    signal output y;
    log("n is", n);
    log("x is", x);
    y <== x * n;
}
component main = T(7);
"""
    compile_source(src, verbose=True)
    out = capsys.readouterr().out
    assert "n is 7" in out
    assert "x is Unknown" in out
    compile_source(src)  # default: silent
    assert "n is 7" not in capsys.readouterr().out


def test_artifact_v2_roundtrips_guards_hints_extern():
    """Serialized programs (v2) carry while-guards, tag range hints,
    extern_c recipes and constraint-derived input hints — a reloaded
    program behaves exactly like a fresh compile."""
    import json
    import tempfile

    from circom_tpu import register_extern
    from circom_tpu.backend.artifacts import load_program, save_program
    from circom_tpu.compiler.executor import EXTERN_IMPLS
    from circom_tpu.compiler.pipeline import compile_source

    src = """
pragma circom 2.0.6;
pragma custom_templates;
template custom extern_c Ex() { signal input i; signal output o; }
template T() {
    signal input x;
    signal input b;
    signal output y;
    signal {maxbit} t;
    t.maxbit = 4;
    t <-- x & 15;
    b * (b - 1) === 0;
    var q = 0;
    var r = x;
    while (r >= 3) { r = r - 3; q = q + 1; }
    component e = Ex();
    e.i <== x;
    y <-- q + t + e.o + b;
    y*0 === 0;
}
component main = T();
"""
    register_extern("Ex", lambda params, ins: {"o": ins["i"] * 2})
    try:
        cc = compile_source(src, prime="goldilocks")
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            path = f.name
        save_program(cc, path)
        tape, layout = cc.build_tape()
        tape2, layout2, meta = load_program(path)
        assert tape2.n_guards == tape.n_guards == 1
        assert tape2.node_hints == tape.node_hints
        assert (0, 15) in tape2.node_hints.values()
        assert tape2.extern_calls == tape.extern_calls
        assert len(tape2.extern_calls) == 1
        assert meta["input_range_hints"] == cc.input_range_hints()
        assert meta["input_range_hints"][1] == (0, 1)  # b's bit hint
        assert layout2 == layout
        # raw JSON is v2
        assert json.load(open(path))["version"] == 2
    finally:
        EXTERN_IMPLS.clear()
