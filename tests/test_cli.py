"""CLI driver behavior (reference circom/src/main.rs exit protocol).

Uses goldilocks so the fused TPU kernels are fast in CPU interpret
mode (see test_fused.py header).
"""

import json
import os

from circom_tpu.cli import main

GOOD = """
pragma circom 2.0.0;
template T() {
    signal input in;
    signal output o;
    o <== in * in + 1;
}
component main = T();
"""

# the <-- hint violates the === constraint: every witness from the
# batched TPU path must fail the injected sanity check
BAD_HINT = """
pragma circom 2.0.0;
template T() {
    signal input in;
    signal output o;
    o <-- in + 1;
    o * 1 === in + 2;
}
component main = T();
"""


def _write(tmp_path, name, src):
    p = tmp_path / name
    p.write_text(src)
    return str(p)


def _inputs(tmp_path, rows):
    p = tmp_path / "inputs.json"
    p.write_text(json.dumps(rows))
    return str(p)


def test_witness_tpu_sanity_check_passes(tmp_path, capsys):
    circ = _write(tmp_path, "good.circom", GOOD)
    inp = _inputs(tmp_path, [{"in": 3}, {"in": 5}])
    rc = main([circ, "--prime", "goldilocks", "-o", str(tmp_path),
               "--witness-tpu", inp, "--sanity_check", "2"])
    assert rc == 0
    assert os.path.exists(tmp_path / "good.0.wtns")
    from circom_tpu.emit.binfmt import read_wtns

    w = read_wtns(str(tmp_path / "good.0.wtns"))
    assert w["values"][1] == 10  # first output: 3*3+1


def test_witness_tpu_sanity_check_catches_bad_hint(tmp_path, capsys):
    """--sanity_check >= 1 runs the batched Az∘Bz−Cz checker on the
    TPU witness path and fails with the offending constraint, matching
    the reference's injected runtime asserts (input_user.rs:514-520,
    store_bucket.rs:674-733)."""
    circ = _write(tmp_path, "bad.circom", BAD_HINT)
    inp = _inputs(tmp_path, [{"in": 3}])
    rc = main([circ, "--prime", "goldilocks", "-o", str(tmp_path),
               "--witness-tpu", inp, "--sanity_check", "1"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "T3012" in err and "constraint" in err
    assert not os.path.exists(tmp_path / "bad.0.wtns")


def test_witness_tpu_sanity_check_off(tmp_path):
    """--sanity_check 0 skips the checker (reference parity: level 0
    disables injected asserts)."""
    circ = _write(tmp_path, "bad.circom", BAD_HINT)
    inp = _inputs(tmp_path, [{"in": 3}])
    rc = main([circ, "--prime", "goldilocks", "-o", str(tmp_path),
               "--witness-tpu", inp, "--sanity_check", "0"])
    assert rc == 0
    assert os.path.exists(tmp_path / "bad.0.wtns")


def test_compat_flags(tmp_path):
    """Reference compat flags (--wat/--inputs/--irout/--no_asm,
    input_user.rs:397-585) are honored with TPU-native equivalents
    rather than silently dropped."""
    circ = _write(tmp_path, "g.circom", GOOD)
    rc = main([circ, "--prime", "goldilocks", "-o", str(tmp_path),
               "--wat", "--inputs", "--irout", "--no_asm"])
    assert rc == 0
    assert (tmp_path / "g.tpu.json").exists()
    assert "in dims=[] offset=0" in (tmp_path / "log_inputs.txt").read_text()
    ir = (tmp_path / "g.ir.txt").read_text()
    assert "%0 = input" in ir and "outputs:" in ir


# a bit-constrained input: input_range_hints proves {0,1}, so the
# narrow int32 lane is used — an out-of-range input must be rejected
# host-side even with --sanity_check 0
BIT_INPUT = """
pragma circom 2.0.0;
template T() {
    signal input b;
    signal output o;
    b * (b - 1) === 0;
    o <== b + 1;
}
component main = T();
"""


def test_witness_tpu_hinted_input_out_of_range(tmp_path, capsys):
    """Range-hinted inputs are validated host-side UNCONDITIONALLY:
    with --sanity_check 0 the batched R1CS check is off, so a value
    violating its bit constraint must fail loudly (T3015) instead of
    silently emitting an int32-lane-divergent .wtns."""
    circ = _write(tmp_path, "bit.circom", BIT_INPUT)
    inp = _inputs(tmp_path, [{"b": 1}, {"b": 2}])
    rc = main([circ, "--prime", "goldilocks", "-o", str(tmp_path),
               "--witness-tpu", inp, "--sanity_check", "0"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "T3015" in err and "'b'" in err and "witness 1" in err
    assert not os.path.exists(tmp_path / "bit.0.wtns")


def test_witness_tpu_hinted_input_in_range(tmp_path):
    circ = _write(tmp_path, "bit.circom", BIT_INPUT)
    inp = _inputs(tmp_path, [{"b": 1}, {"b": 0}])
    rc = main([circ, "--prime", "goldilocks", "-o", str(tmp_path),
               "--witness-tpu", inp, "--sanity_check", "0"])
    assert rc == 0
    from circom_tpu.emit.binfmt import read_wtns

    assert read_wtns(str(tmp_path / "bit.0.wtns"))["values"][1] == 2
    assert read_wtns(str(tmp_path / "bit.1.wtns"))["values"][1] == 1


def test_standalone_witness_from_artifact(tmp_path):
    """The generate_witness.js analog: compile once (--tpu), then
    `python -m circom_tpu.witness artifact inputs -o out` generates
    batched witnesses without recompiling — guards, hints and the
    sanity checker all ride the artifact (v2)."""
    from circom_tpu.witness import main as wmain

    circ = _write(tmp_path, "g.circom", GOOD)
    rc = main([circ, "--prime", "goldilocks", "-o", str(tmp_path),
               "--tpu"])
    assert rc == 0
    inp = _inputs(tmp_path, [{"in": 3}, {"in": 5}])
    rc = wmain([str(tmp_path / "g.tpu.json"), inp, "-o", str(tmp_path)])
    assert rc == 0
    from circom_tpu.emit.binfmt import read_wtns

    assert read_wtns(str(tmp_path / "g.0.wtns"))["values"][1] == 10
    assert read_wtns(str(tmp_path / "g.1.wtns"))["values"][1] == 26
    # bad witness still caught by the artifact-carried checker
    circ2 = _write(tmp_path, "bad.circom", BAD_HINT)
    rc = main([circ2, "--prime", "goldilocks", "-o", str(tmp_path),
               "--tpu"])
    assert rc == 0
    rc = wmain([str(tmp_path / "bad.tpu.json"), inp, "-o", str(tmp_path)])
    assert rc == 1


def test_witness_rejects_batch_list(tmp_path, capsys):
    """A multi-entry batch list handed to --witness reports T3010
    (single-witness path takes exactly one input object); a singleton
    list is accepted."""
    circ = _write(tmp_path, "t.circom", GOOD)
    bad = _inputs(tmp_path, [{"in": 1}, {"in": 2}])
    code = main([circ, "-o", str(tmp_path / "o1"), "--witness", bad,
                 "--prime", "goldilocks"])
    assert code == 1
    cap = capsys.readouterr()
    assert "batch files go to --witness-tpu" in cap.out + cap.err
    good = _inputs(tmp_path, [{"in": 3}])
    code = main([circ, "-o", str(tmp_path / "o2"), "--witness", good,
                 "--prime", "goldilocks"])
    assert code == 0
