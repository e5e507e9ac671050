"""extern_c custom gates (reference
mkdocs/docs/circom-language/templates-and-components.md:204-222,
code_producers/src/c_elements/c_code_generator.rs:514-545)."""

from circom_tpu import register_extern
from circom_tpu.compiler.executor import EXTERN_IMPLS
from circom_tpu.compiler.pipeline import compile_source

PRIME = "goldilocks"

SRC = """
pragma circom 2.0.6;
pragma custom_templates;

template custom extern_c Neg() {
    signal input in;
    signal output out;
    out <-- 0 - in;
}

template T() {
    signal input x;
    signal output y;
    component n = Neg();
    n.in <== x;
    y <== n.out;
}
component main = T();
"""

# body declares signals only; the external implementation computes
SRC_DECL_ONLY = SRC.replace("out <-- 0 - in;", "")


def test_extern_c_body_runs_normally():
    """Like the reference WASM path: extern_c is ignored, body executes."""
    cc = compile_source(SRC, prime=PRIME)
    w = list(cc.witness_host({"x": 5}))
    assert w[1] == cc.p - 5  # main output y = -5


def test_extern_c_registered_impl_overrides():
    cc = compile_source(SRC, prime=PRIME)
    register_extern("Neg", lambda params, ins: {"out": ins["in"] + 1000})
    try:
        w = list(cc.witness_host({"x": 5}))
        assert w[1] == 1005  # external linkage is authoritative
    finally:
        EXTERN_IMPLS.clear()


def test_extern_c_declaration_only_body():
    cc = compile_source(SRC_DECL_ONLY, prime=PRIME)
    register_extern("Neg", lambda params, ins: {"out": 7 * ins["in"]})
    try:
        w = list(cc.witness_host({"x": 3}))
        assert w[1] == 21
    finally:
        EXTERN_IMPLS.clear()


def test_extern_c_banner_signature():
    from circom_tpu.cli import _extern_c_banner

    cc = compile_source(SRC, prime="bn128")
    banner = _extern_c_banner(cc.archive.templates["Neg"], "bn128")
    assert "void Neg(FrElement* out ,uint* size_out ," in banner
    assert "FrElement* in ,uint* size_in " in banner
    assert "needs to be implemented" in banner
    banner64 = _extern_c_banner(cc.archive.templates["Neg"], "goldilocks")
    assert "uint64_t* out" in banner64


def test_extern_impl_recorded_on_tape_path():
    """A registered extern implementation is authoritative everywhere
    (reference extern_c linkage): the tape path records the call and
    turns the gate's outputs into extra input slots; running without
    the spliced columns would fail loudly in compute_extern_columns."""
    cc = compile_source(SRC, prime=PRIME)
    register_extern("Neg", lambda args, ins: {"out": [7]})
    try:
        tape, _ = cc.build_tape()
        assert len(tape.extern_calls) == 1
        call = tape.extern_calls[0]
        assert call["template"] == "Neg"
        assert call["out_slots"] == {"out": [1]}
        assert tape.n_inputs == 2
    finally:
        EXTERN_IMPLS.pop("Neg", None)


def test_extern_c_tpu_path_splices_host_columns():
    """The batched TPU contract (VERDICT r2 item 9): registered extern
    implementations run host-side per batch column and their outputs
    are spliced into the device inputs as extra slots."""
    import numpy as np

    from circom_tpu.backend.jax_backend import WitnessProgram
    from circom_tpu.backend.tape import compute_extern_columns
    from circom_tpu.field.primes import field_spec
    from circom_tpu.ops.limbs import limbs_to_int

    cc = compile_source(SRC_DECL_ONLY, prime=PRIME)
    register_extern("Neg", lambda params, ins: {"out": 7 * ins["in"]})
    try:
        tape, _ = cc.build_tape()
        assert len(tape.extern_calls) == 1
        assert tape.n_inputs == 2  # main x + spliced Neg.out
        spec = field_spec(PRIME)
        prog = WitnessProgram(tape, spec, unroll_threshold=1 << 30)
        cols = [[3, 10], []]
        compute_extern_columns(tape, cols, cc.hf)
        assert cols[1] == [21, 70]
        out = np.asarray(prog.run(prog.encode_inputs(cols)))
        for j, x in enumerate([3, 10]):
            exp = cc.witness_host({"x": x})
            got = [limbs_to_int(out[i, :, j]) for i in range(out.shape[0])]
            assert got == list(exp)
    finally:
        EXTERN_IMPLS.clear()


def test_extern_c_tpu_cli_end_to_end(tmp_path):
    """--witness-tpu on an extern_c circuit: the CLI splices host
    columns automatically; without a registered impl the body runs
    normally (reference WASM behavior)."""
    import json

    from circom_tpu.cli import main as cli_main
    from circom_tpu.emit.binfmt import read_wtns

    circ = tmp_path / "x.circom"
    circ.write_text(SRC)
    inp = tmp_path / "in.json"
    inp.write_text(json.dumps([{"x": 5}]))
    # no registered impl: body executes (out = -in)
    rc = cli_main([str(circ), "--prime", PRIME, "-o", str(tmp_path),
                   "--witness-tpu", str(inp), "--sanity_check", "0"])
    assert rc == 0
    cc = compile_source(SRC, prime=PRIME)
    w = read_wtns(str(tmp_path / "x.0.wtns"))["values"]
    assert w[1] == cc.p - 5
    # registered impl overrides on the TPU path too
    register_extern("Neg", lambda params, ins: {"out": ins["in"] + 1000})
    try:
        rc = cli_main([str(circ), "--prime", PRIME, "-o", str(tmp_path),
                       "--witness-tpu", str(inp), "--sanity_check", "0"])
        assert rc == 0
        w = read_wtns(str(tmp_path / "x.0.wtns"))["values"]
        assert w[1] == 1005
    finally:
        EXTERN_IMPLS.clear()


def test_extern_c_chained_gates_tpu():
    """A gate consuming another gate's output: calls are evaluated in
    execution order, later gates see earlier spliced columns."""
    import numpy as np

    from circom_tpu.backend.jax_backend import WitnessProgram
    from circom_tpu.backend.tape import compute_extern_columns
    from circom_tpu.field.primes import field_spec
    from circom_tpu.ops.limbs import limbs_to_int

    src = """
pragma circom 2.0.6;
pragma custom_templates;
template custom extern_c A() { signal input in; signal output out; }
template custom extern_c B() { signal input in; signal output out; }
template T() {
    signal input x;
    signal output y;
    component a = A();
    component b = B();
    a.in <== x;
    b.in <== a.out + 1;
    y <== b.out;
}
component main = T();
"""
    register_extern("A", lambda params, ins: {"out": ins["in"] * 3})
    register_extern("B", lambda params, ins: {"out": ins["in"] + 100})
    try:
        cc = compile_source(src, prime=PRIME)
        tape, _ = cc.build_tape()
        assert len(tape.extern_calls) == 2
        cols = compute_extern_columns(tape, [[2, 5]], cc.hf)
        spec = field_spec(PRIME)
        prog = WitnessProgram(tape, spec, unroll_threshold=1 << 30)
        out = np.asarray(prog.run(prog.encode_inputs(cols)))
        for j, x in enumerate([2, 5]):
            exp = cc.witness_host({"x": x})
            got = [limbs_to_int(out[i, :, j]) for i in range(out.shape[0])]
            assert got == list(exp)
            assert got[1] == x * 3 + 1 + 100
    finally:
        EXTERN_IMPLS.clear()
