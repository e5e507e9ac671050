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


def test_extern_impl_rejected_on_tape_path():
    """A registered extern implementation is authoritative everywhere
    (reference extern_c linkage): the tape path must fail loudly rather
    than silently executing the template body and diverging from the
    host calculator."""
    import pytest

    cc = compile_source(SRC, prime=PRIME)
    register_extern("Neg", lambda args, ins: {"out": [7]})
    try:
        with pytest.raises(NotImplementedError, match="extern_c"):
            cc.build_tape()
    finally:
        EXTERN_IMPLS.pop("Neg", None)
