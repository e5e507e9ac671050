"""Word-level bit packing (backend/bitpack.py) on SHA-style circuits.

The pass recovers 32-bit word structure from bit-blasted tapes:
Num2Bits-extracted bits and {0,1}-range inputs become atoms, per-bit
gadget families (XOR3 with rotated wirings, Ch, AND mids) pack into
one int32 formula each, bit-lincomb sums consume whole shifted words,
and packed witness bits emit as one word row unpacked at gather time.

Execution parity runs the interp kernel in interpret mode on CPU
(goldilocks, all-narrow plans — fast); structural assertions check the
plan packs (step count, packed emission rows).  Real-hardware bn128
validation is the SHA256 full-batch digest check (bench.py).
"""

import random

import numpy as np

from circom_tpu.backend.jax_backend import WitnessProgram
from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.field.primes import field_spec
from circom_tpu.ops.limbs import ints_to_limbs

PRIME = "goldilocks"
SPEC = field_spec(PRIME)

# one sigma-style rotated XOR3 (wrap + shr-boundary families, an AND
# mid family) + a 2-word mod-2^32 adder (split sum consuming packed
# words + an input word + carry bits)
WORD_SRC = r"""
pragma circom 2.0.0;
template Xor3W() {
    signal input a[32]; signal input b[32]; signal input c[32];
    signal output out[32];
    signal mid[32];
    for (var k = 0; k < 32; k++) {
        mid[k] <== b[k] * c[k];
        out[k] <== a[k] * (1 - 2*b[k] - 2*c[k] + 4*mid[k])
                   + b[k] + c[k] - 2*mid[k];
    }
}
template AddModW(n, nbits) {
    signal input words[n][32];
    signal output out[32];
    signal bits[nbits];
    var lc = 0;
    for (var j = 0; j < n; j++) {
        for (var k = 0; k < 32; k++) { lc += words[j][k] * 2 ** k; }
    }
    var acc = 0;
    for (var k = 0; k < nbits; k++) {
        bits[k] <-- (lc >> k) & 1;
        bits[k] * (bits[k] - 1) === 0;
        acc += bits[k] * 2 ** k;
    }
    acc === lc;
    for (var k = 0; k < 32; k++) { out[k] <== bits[k]; }
}
template Mini() {
    signal input x[32];
    signal input y[32];
    signal output out[32];
    for (var k = 0; k < 32; k++) {
        x[k] * (x[k] - 1) === 0;
        y[k] * (y[k] - 1) === 0;
    }
    component s = Xor3W();
    for (var k = 0; k < 32; k++) {
        s.a[k] <== x[(k + 7) % 32];
        s.b[k] <== x[(k + 18) % 32];
        s.c[k] <== k + 3 < 32 ? x[k + 3] : 0;
    }
    component add = AddModW(2, 33);
    for (var k = 0; k < 32; k++) {
        add.words[0][k] <== s.out[k];
        add.words[1][k] <== y[(k + 5) % 32];
    }
    for (var k = 0; k < 32; k++) { out[k] <== add.out[k]; }
}
component main = Mini();
"""


def _program():
    cc = compile_source(WORD_SRC, prime=PRIME)
    tape, _ = cc.build_tape()
    ranges = cc.input_range_hints()
    assert len(ranges) == tape.n_inputs  # bit constraints prove inputs
    prog = WitnessProgram(tape, SPEC, unroll_threshold=0, mode="interp",
                          input_ranges=ranges)
    return cc, tape, prog


def test_word_circuit_packs():
    """The plan packs the gadget bits: witness rows come from packed
    word emissions and the step count is far below bit-blasted."""
    _cc, tape, prog = _program()
    f = prog.fused
    # 96 gadget bit signals (mid + out + sum bits<32) emit via packed
    # words; only the k>=32 carry stays scalar
    assert len(f._bit_src) >= 90, len(f._bit_src)
    # bit-blasted: >= 5 ops per gadget bit (~600+); packed: word-level
    # (the 64 input passthrough copies and the carry stay per-value)
    assert f.n_steps < 420, f.n_steps
    ops = f.stats()["ops"]
    assert "nshru" in ops  # rotations/unpack shifts are logical
    assert not any(op in ops for op in ("mul", "mul_c", "widen")), ops


def test_word_circuit_parity_full_limb():
    """Packed interp witness == host calculator (full-limb path)."""
    cc, tape, prog = _program()
    rng = random.Random(11)
    B = 16
    cols = [[rng.randrange(2) for _ in range(B)]
            for _ in range(tape.n_inputs)]
    arr = prog.encode_inputs(cols)
    out = np.asarray(prog.run(arr))
    for j in range(0, B, 5):
        w = cc.witness_host({
            "x": [cols[k][j] for k in range(32)],
            "y": [cols[32 + k][j] for k in range(32)]})
        exp = np.asarray(ints_to_limbs(w, prog.jf.L))
        assert (out[:, :, j] == exp).all(), f"column {j}"


def test_word_circuit_parity_mixed():
    """Mixed-representation witness (narrow rows carry unpacked bits
    via the emitb shift path) == host calculator."""
    cc, tape, prog = _program()
    f = prog.fused
    rng = random.Random(12)
    B = 16
    cols = [[rng.randrange(2) for _ in range(B)]
            for _ in range(tape.n_inputs)]
    arr = np.asarray(prog.encode_inputs(cols))
    nw, wd = f.run_mixed(arr)
    nw = np.asarray(nw)
    wd = np.asarray(wd)
    n_idx, w_idx = f.mixed_layout()
    for j in (0, 7, 15):
        w = list(cc.witness_host({
            "x": [cols[k][j] for k in range(32)],
            "y": [cols[32 + k][j] for k in range(32)]}))
        for r, wi in enumerate(n_idx):
            v = int(nw[r, j])
            assert v % SPEC.p == w[wi] % SPEC.p, (r, wi)
        for r, wi in enumerate(w_idx):
            got = sum(int(wd[r, i, j]) << (16 * i)
                      for i in range(f.L))
            assert got == w[wi], (r, wi)


def test_sha256_plan_stays_packed():
    """Flagship tripwire: the real SHA256 circuit's interpreter plan
    must stay word-packed (a silent bitpack regression would show up
    as a step-count explosion long before the bench runs)."""
    import os

    src = (open(os.path.join(os.path.dirname(__file__), "..",
                             "circom_tpu", "circuits",
                             "sha256.circom")).read()
           + "\ncomponent main = Sha256Block();\n")
    cc = compile_source(src)
    tape, _ = cc.build_tape()
    spec = field_spec("bn128")
    ranges = cc.input_range_hints()
    assert len(ranges) == tape.n_inputs
    prog = WitnessProgram(tape, spec, unroll_threshold=0,
                          mode="interp", input_ranges=ranges)
    f = prog.fused
    # bit-blasted plan was ~164k steps; packed is ~36k
    assert f.n_steps < 60_000, f.n_steps
    # ~25k witness bits ride packed word rows
    assert len(f._bit_src) > 20_000, len(f._bit_src)
    # SHA stays pure-narrow (zero wide field ops)
    ops = f.stats()["ops"]
    assert not any(op in ops for op in ("mul", "mul_c", "widen")), ops


NWORD_SRC = r"""
pragma circom 2.0.0;
template SharedSum() {
    // xor-gadget bits (a packed family) summed bit*2^k into a NARROW
    // value that is SHARED by two consumers: such sums bypass both
    // the split-sum pass (wide roots only, all-shift consumers) and
    // the wide nroots reassociation — the narrow word-sum pass must
    // group the products into masked/shifted packed words.
    signal input x[32];
    signal input y[32];
    signal g[30];
    signal output o1;
    signal output o2;
    for (var k = 0; k < 32; k++) {
        x[k] * (x[k] - 1) === 0;
        y[k] * (y[k] - 1) === 0;
    }
    var lc = 0;
    for (var k = 0; k < 30; k++) {
        g[k] <== x[k] + y[k] - 2*x[k]*y[k];  // xor family
        lc += g[k] * 2 ** k;
    }
    o1 <== lc + x[30];
    o2 <== lc + y[31];
}
component main = SharedSum();
"""


def test_narrow_word_sum_pass():
    """A CSE-shared narrow bit-lincomb plans as word sums (nword) and
    the witness matches the host calculator exactly."""
    cc = compile_source(NWORD_SRC, prime=PRIME)
    tape, _ = cc.build_tape()
    ranges = cc.input_range_hints()
    prog = WitnessProgram(tape, SPEC, unroll_threshold=0, mode="interp",
                          input_ranges=ranges)
    f = prog.fused
    assert f.n_nword >= 1, "narrow word-sum pass did not fire"
    ops = f.stats()["ops"]
    assert "nmul" not in ops, ops  # every product grouped away
    rng = random.Random(31)
    B = 16
    cols = [[rng.randrange(2) for _ in range(B)]
            for _ in range(tape.n_inputs)]
    arr = prog.encode_inputs(cols)
    out = np.asarray(prog.run(arr))
    for j in range(0, B, 3):
        w = cc.witness_host({
            "x": [cols[k][j] for k in range(32)],
            "y": [cols[32 + k][j] for k in range(32)]})
        exp = np.asarray(ints_to_limbs(w, prog.jf.L))
        assert (out[:, :, j] == exp).all(), f"column {j}"


def test_narrow_limb_input_rows():
    """All-narrow input sets accept (n, 2, B) input rows — interp
    reads only limbs 0-1 for the narrow lane (8x less transfer for
    SHA-class); witnesses must match the full-limb encoding."""
    cc, tape, prog = _program()
    f = prog.fused
    rng = random.Random(21)
    B = 16
    cols = [[rng.randrange(2) for _ in range(B)]
            for _ in range(tape.n_inputs)]
    full = np.asarray(prog.encode_inputs(cols))
    nw1, wd1 = f.run_mixed(full)
    nw2, wd2 = f.run_mixed(full[:, :2])
    assert (np.asarray(nw1) == np.asarray(nw2)).all()
    assert (np.asarray(wd1) == np.asarray(wd2)).all()


def test_duplicated_lincomb_term_stays_exact():
    """A term repeated in a bit-lincomb (`... + g[0]*1 + g[0]*1`)
    cannot be represented by one packed-word mask bit — duplicates
    must fall back to scalar terms (r5 review finding: the grouped
    emission silently counted them once)."""
    src = """
pragma circom 2.0.0;
template T() {
    signal input a[64];
    signal g[32];
    signal output s;
    signal output s2;
    for (var k = 0; k < 64; k++) { a[k] * (a[k] - 1) === 0; }
    var lc = 0;
    for (var k = 0; k < 32; k++) {
        g[k] <== a[k] + a[32+k] - 2*a[k]*a[32+k];
        lc += g[k] * 2 ** k;
    }
    s <== lc + g[0]*1 + g[0]*1 + a[0];
    s2 <== lc + a[1];
}
component main = T();
"""
    cc = compile_source(src, prime=PRIME)
    tape, _ = cc.build_tape()
    prog = WitnessProgram(tape, SPEC, unroll_threshold=0, mode="interp",
                          input_ranges=cc.input_range_hints())
    rng = random.Random(4)
    B = 8
    cols = [[rng.randrange(2) for _ in range(B)]
            for _ in range(tape.n_inputs)]
    out = np.asarray(prog.run(prog.encode_inputs(cols)))
    for j in range(B):
        w = cc.witness_host({"a": [cols[k][j] for k in range(64)]})
        exp = np.asarray(ints_to_limbs(w, prog.jf.L))
        assert (out[:, :, j] == exp).all(), f"column {j}"
