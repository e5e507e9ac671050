"""Value-range analysis over the witness tape: the narrow-lane planner.

Bit-blasted circuits (SHA-class) compute thousands of {0,1}-valued
signals with full prime-field arithmetic in the reference runtimes.  On
TPU that costs a 16-limb Montgomery multiply per bit gadget.  This pass
proves signed ranges for tape nodes; nodes whose values provably fit a
signed int32 (and all of whose consumers see exact ring arithmetic) can
execute on a NARROW int32 lane — one VPU op instead of ~2,500.

Soundness: a narrow value v (|v| < 2^31) represents the field element
v mod p.  Ring ops (+, -, *) commute with the ℤ→F_p homomorphism, so
computing them on ints is exact as long as results stay in range
(interval arithmetic proves it; int32 wraparound cannot occur for
proven-in-range results).  The circom signed comparison convention
(values > p/2 compare negative, modular_arithmetic.rs:155-165) makes
the signed int *be* the compared value, so comparisons are plain int
compares.  Bitwise ops and shifts require proven-nonnegative operands
(the canonical value equals the int).

Inputs default to wide; signals tagged `binary` / valued `maxbit`
narrow them (tags are the circuit author's range assertions — the same
information the reference exports for downstream provers).
"""

NARROW_MAX = (1 << 31) - 1

# ops that may produce a narrow value (given narrow/eligible args)
_RING = {"add", "sub", "mul", "neg", "select"}
_BITS01 = {"eq", "neq", "lt", "le", "gt", "ge", "land", "lor", "lnot"}
_BITWISE = {"band", "bor", "bxor"}


def _hull(*ivs):
    return (min(lo for lo, _ in ivs), max(hi for _, hi in ivs))


def analyze_ranges(tape, input_ranges=None):
    """Per-node signed interval (lo, hi), or None (wide).

    ``input_ranges``: dict input_index -> (lo, hi) from signal tags.
    Ranges are *plain-value* semantics (the source tape, before any
    Montgomery domain assignment).
    """
    p = tape.p
    half = p >> 1
    bits = p.bit_length()
    mask = (1 << bits) - 1
    input_ranges = input_ranges or {}
    n = len(tape.ops)
    rng = [None] * n

    def ok(lo, hi):
        return -NARROW_MAX <= lo and hi <= NARROW_MAX

    for i in range(n):
        op = tape.ops[i]
        a = tape.args[i]
        imm = tape.imms[i]
        r = [rng[x] for x in a]
        if op == "const":
            v = imm
            s = v if v <= half else v - p
            if abs(s) <= NARROW_MAX:
                rng[i] = (s, s)
            continue
        if op == "input":
            rng[i] = input_ranges.get(imm)
            continue
        if op in _BITS01:
            rng[i] = (0, 1)
            continue
        if op == "add" and None not in r:
            lo, hi = r[0][0] + r[1][0], r[0][1] + r[1][1]
            if ok(lo, hi):
                rng[i] = (lo, hi)
            continue
        if op == "sub" and None not in r:
            lo, hi = r[0][0] - r[1][1], r[0][1] - r[1][0]
            if ok(lo, hi):
                rng[i] = (lo, hi)
            continue
        if op == "neg" and r[0] is not None:
            lo, hi = -r[0][1], -r[0][0]
            if ok(lo, hi):
                rng[i] = (lo, hi)
            continue
        if op == "mul" and None not in r:
            cs = [x * y for x in r[0] for y in r[1]]
            lo, hi = min(cs), max(cs)
            if ok(lo, hi):
                rng[i] = (lo, hi)
            continue
        if op == "select" and r[1] is not None and r[2] is not None:
            # cond may be wide (nonzero test); result is the hull
            rng[i] = _hull(r[1], r[2])
            continue
        if op == "band":
            # band with a small constant narrows a WIDE operand too:
            # the result is bounded by the constant's bit pattern
            bounds = []
            for x, rx in zip(a, r):
                if tape.ops[x] == "const":
                    bounds.append(tape.imms[x])
                elif rx is not None and rx[0] >= 0:
                    bounds.append(rx[1])
                else:
                    bounds.append(None)
            known = [b for b in bounds if b is not None]
            if known and min(known) <= NARROW_MAX:
                rng[i] = (0, min(known))
            continue
        if op in ("bor", "bxor") and None not in r \
                and r[0][0] >= 0 and r[1][0] >= 0:
            hi = max(r[0][1], r[1][1])
            hi = (1 << hi.bit_length()) - 1
            if hi <= NARROW_MAX:
                rng[i] = (0, hi)
            continue
        if op == "shr_k" and r[0] is not None and r[0][0] >= 0:
            rng[i] = (r[0][0] >> imm, r[0][1] >> imm)
            continue
        if op == "shl_k" and r[0] is not None and r[0][0] >= 0:
            hi = r[0][1] << imm
            if hi <= NARROW_MAX and hi <= mask and hi < p:
                rng[i] = (r[0][0] << imm, hi)
            continue
        # everything else (div, pow, bnot, dynamic shifts, ...) is wide

    return rng


def narrow_nodes(tape, input_ranges=None):
    """The set of node ids eligible for the narrow int32 lane.

    A node is narrow when its range is proven AND its op belongs to the
    narrow instruction set with compatibly-represented operands:

    * ring ops / shifts / bitwise: every non-const operand narrow
      (band also narrows wide operands against a small constant);
    * comparisons & booleans: always narrow results (operands may be
      wide — the kernel has wide-operand compare variants);
    * const operands must themselves fit int32 (range analysis already
      requires it via interval propagation, except band/select).
    """
    rng = analyze_ranges(tape, input_ranges)
    narrow = set()
    for i in range(len(tape.ops)):
        if rng[i] is None:
            continue
        op = tape.ops[i]
        if op in ("const", "input"):
            narrow.add(i)
            continue
        if op in _BITS01:
            narrow.add(i)
            continue
        args = tape.args[i]
        if op == "band":
            # allowed: both narrow, or wide & small-const
            if all(rng[x] is not None for x in args) or any(
                    tape.ops[x] == "const"
                    and tape.imms[x] <= NARROW_MAX for x in args):
                narrow.add(i)
            continue
        if op == "select":
            if all(rng[x] is not None for x in args[1:]):
                narrow.add(i)  # cond handled wide or narrow in-kernel
            continue
        if op in ("add", "sub", "mul", "neg", "bor", "bxor",
                  "shl_k", "shr_k"):
            if all(rng[x] is not None for x in args):
                narrow.add(i)
            continue
    return narrow, rng
