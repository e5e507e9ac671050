"""Native C++ tape runtime vs the Python host calculator."""

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.field.primes import field_spec

SPEC = field_spec("bn128")


def run_native(src, input_rows, prime="bn128"):
    from circom_tpu.native import NativeCalculator

    cc = compile_source(src, prime=prime)
    tape, layout = cc.build_tape()
    nc = NativeCalculator(tape, field_spec(prime))
    outs = nc.run(input_rows)
    for row, got in zip(input_rows, outs):
        inputs = {}
        for (name, dims, off) in layout:
            n = 1
            for d in dims:
                n *= d
            vals = row[off:off + n]
            inputs[name] = vals if dims else vals[0]
        exp = cc.witness_host(inputs)
        assert got == exp, (got[:4], exp[:4])
    return cc


def test_native_mul_add():
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal input b;
    signal output o1;
    signal output o2;
    o1 <== a * b;
    o2 <== a + b * 3;
}
component main = T();
"""
    P = SPEC.p
    run_native(src, [[3, 4], [P - 1, P - 1], [0, 7]])


def test_native_bit_ops_and_shifts():
    src = """
pragma circom 2.0.0;
template T(n) {
    signal input in;
    signal output out[n];
    var lc = 0;
    for (var i = 0; i < n; i++) {
        out[i] <-- (in >> i) & 1;
        out[i] * (out[i] - 1) === 0;
        lc += out[i] * 2 ** i;
    }
    lc === in;
}
component main = T(12);
"""
    run_native(src, [[0], [1], [0xABC], [4095]])


def test_native_comparisons_select():
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal input b;
    signal output out;
    out <-- a < b ? a : b;
    out === out;
}
component main = T();
"""
    P = SPEC.p
    run_native(src, [[3, 9], [9, 3], [P - 1, 2], [5, 5]])


def test_native_division_ops():
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal input b;
    signal output q;
    signal output r;
    signal output d;
    q <-- a \\ b;
    r <-- a % b;
    d <-- a / b;
    a === b * q + r;
    d * b === a;
}
component main = T();
"""
    run_native(src, [[47, 10], [100, 7], [5, 5]])


def test_native_goldilocks():
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal input b;
    signal output out;
    out <== a * b + 17;
}
component main = T();
"""
    g = field_spec("goldilocks")
    run_native(src, [[3, 4], [g.p - 1, g.p - 2]], prime="goldilocks")


def test_native_dynamic_ops_lowered():
    """Witness-dependent pow/shl/shr/mod run on the native runtime via
    the same dynops lowering as the TPU path (idiv stays native)."""
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal input k;
    signal output o1;
    signal output o2;
    signal output o3;
    o1 <-- (a >> k) + (a << k);
    o2 <-- a ** k;
    o3 <-- (a \\ (k + 1)) + (a % (k + 1));
    o1*0 === 0; o2*0 === 0; o3*0 === 0;
}
component main = T();
"""
    P = SPEC.p
    run_native(src, [[123456, 7], [P - 2, 200], [5, P - 3], [9, 0],
                     [P - 1, 254]])


def test_native_narrow_idiv():
    """Small bit-bounded operands take tapeval's narrow int64 idiv."""
    src = """
pragma circom 2.0.0;
template T() {
    signal input a;
    signal output q;
    signal output r;
    var m = a & 65535;         // proven narrow
    q <-- m \\ 10;
    r <-- m % 10;
    q*0 === 0; r*0 === 0;
}
component main = T();
"""
    run_native(src, [[65535], [12345], [0], [99999999]])
