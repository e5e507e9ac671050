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
