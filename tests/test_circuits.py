"""Benchmark-circuit correctness: SHA256 vs hashlib, Merkle inclusion."""

import hashlib

import pytest

from circom_tpu.compiler.pipeline import compile_source
from circom_tpu.circuits.gen_poseidon import generate as gen_poseidon


def msg_to_bits(msg: bytes):
    assert len(msg) <= 55
    block = (bytearray(msg) + b"\x80" + b"\x00" * (55 - len(msg))
             + (8 * len(msg)).to_bytes(8, "big"))
    bits = [0] * 512
    for t in range(16):
        word = int.from_bytes(block[4 * t:4 * t + 4], "big")
        for k in range(32):
            bits[32 * t + k] = (word >> k) & 1
    return bits


def out_to_digest(outbits):
    b = b""
    for j in range(8):
        word = sum(outbits[32 * j + k] << k for k in range(32))
        b += word.to_bytes(4, "big")
    return b


@pytest.fixture(scope="module")
def sha_cc():
    src = (open("circom_tpu/circuits/sha256.circom").read()
           + "\ncomponent main = Sha256Block();\n")
    return compile_source(src)


def test_sha256_against_hashlib(sha_cc):
    for msg in (b"", b"abc", b"The quick brown fox jumps over the lazy d"):
        w = sha_cc.witness_host({"in": msg_to_bits(msg)})
        assert out_to_digest(w[1:257]).hex() == \
            hashlib.sha256(msg).hexdigest()


def test_sha256_constraint_count(sha_cc):
    # ~27.5k constraints, circomlib-class size for one block
    n = len(sha_cc.r1cs_rows())
    assert 20000 < n < 40000


def test_sha256_r1cs_satisfied(sha_cc):
    from circom_tpu.compiler.algebra import CONST

    w = sha_cc.witness_host({"in": msg_to_bits(b"xyz")})
    P = sha_cc.p

    def ev(lc):
        acc = 0
        for k, v in lc.items():
            acc += v if k == CONST else w[k] * v
        return acc % P

    for (a, b, c) in sha_cc.r1cs_rows():
        assert (ev(a) * ev(b) - ev(c)) % P == 0


@pytest.fixture(scope="module")
def merkle_cc():
    src = (gen_poseidon((2,))
           + open("circom_tpu/circuits/merkle.circom").read()
           .replace("pragma circom 2.0.0;", "")
           + "\ncomponent main = MerkleInclusion(8);\n")
    return compile_source(src)


def test_merkle_inclusion(merkle_cc):
    # reference root computed with the host poseidon witness path itself
    # via an independent accumulation over Switcher semantics
    leaf = 41
    elems = [100 + i for i in range(8)]
    bits = [1, 0, 1, 1, 0, 0, 1, 0]
    w = merkle_cc.witness_host(
        {"leaf": leaf, "pathElements": elems, "pathIndex": bits})
    root = w[1]
    # recompute using single Poseidon2 circuit
    pos_src = gen_poseidon((2,)) + "\ncomponent main = Poseidon2();\n"
    pcc = compile_source(pos_src)

    def H(a, b):
        return pcc.witness_host({"inputs": [a, b]})[1]

    cur = leaf
    for s, e in zip(bits, elems):
        cur = H(e, cur) if s else H(cur, e)
    assert cur == root


def test_sha256_tape_digests(sha_cc):
    """TAPE-path digest parity vs hashlib (the check whose absence let
    the round-3 memo miscompile ship: test_sha256_against_hashlib only
    exercises witness_host).  Evaluated with the NativeCalculator so it
    runs on CPU in seconds — the same path the driver's bench asserts
    on device at batch 4096."""
    from circom_tpu.field.primes import field_spec
    from circom_tpu.native import NativeCalculator

    tape, _ = sha_cc.build_tape()
    calc = NativeCalculator(tape, field_spec("bn128"))
    msgs = [b"", b"abc",
            b"The quick brown fox jumps over the lazy d", b"x" * 55]
    wits = calc.run([msg_to_bits(m) for m in msgs])
    for m, w in zip(msgs, wits):
        assert out_to_digest(w[1:257]).hex() == \
            hashlib.sha256(m).hexdigest(), m


def test_merkle_tape_vs_host(merkle_cc):
    """Merkle (Poseidon tree) TAPE path vs the host calculator — the
    second benchmark circuit pinned at the tape level."""
    from circom_tpu.field.primes import field_spec
    from circom_tpu.native import NativeCalculator

    tape, layout = merkle_cc.build_tape()
    calc = NativeCalculator(tape, field_spec("bn128"))
    ins = {"leaf": 41, "pathElements": [100 + i for i in range(8)],
           "pathIndex": [1, 0, 1, 1, 0, 0, 1, 0]}
    flat = []
    for (name, dims, off) in layout:
        v = ins[name]
        flat.extend(v if isinstance(v, list) else [v])
    got = calc.run([flat])[0]
    want = merkle_cc.witness_host(ins)
    assert got[:len(want)] == want


def test_poseidon_tape_vs_host():
    """Poseidon2 TAPE path vs host for several inputs."""
    from circom_tpu.field.primes import field_spec
    from circom_tpu.native import NativeCalculator

    src = gen_poseidon((2,)) + "\ncomponent main = Poseidon2();\n"
    cc = compile_source(src)
    tape, _ = cc.build_tape()
    calc = NativeCalculator(tape, field_spec("bn128"))
    cases = [[0, 0], [1, 2], [cc.p - 1, 12345]]
    wits = calc.run(cases)
    for ins, w in zip(cases, wits):
        want = cc.witness_host({"inputs": ins})
        assert w[:len(want)] == want


def test_sha256_multiblock_chain():
    """Sha256(nBlocks) chains Sha256Compress over the padded message
    blocks (the scale axis: one memoized compression instance, witness
    cost linear in blocks); 2-block digest checked against hashlib."""
    import hashlib

    from circom_tpu.compiler.pipeline import compile_source

    def msg_blocks(msg, nblocks):
        total = nblocks * 64
        block = (bytearray(msg) + b"\x80"
                 + b"\x00" * (total - len(msg) - 9)
                 + (8 * len(msg)).to_bytes(8, "big"))
        out = []
        for b in range(nblocks):
            bits = []
            for t in range(16):
                word = int.from_bytes(
                    block[64 * b + 4 * t:64 * b + 4 * t + 4], "big")
                bits += [(word >> k) & 1 for k in range(32)]
            out.append(bits)
        return out

    src = (open("circom_tpu/circuits/sha256.circom").read()
           + "\ncomponent main = Sha256(2);\n")
    cc = compile_source(src)
    msg = bytes(range(100))  # 100 bytes -> exactly 2 blocks
    w = cc.witness_host({"in": msg_blocks(msg, 2)})
    digest = hashlib.sha256(msg).digest()
    exp = []
    for j in range(8):
        word = int.from_bytes(digest[4 * j:4 * j + 4], "big")
        exp += [(word >> k) & 1 for k in range(32)]
    assert w[1:257] == exp
