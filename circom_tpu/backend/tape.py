"""Witness tape: straight-line SSA program of field ops.

This replaces the reference's WASM/C++ witness-code generation
(compiler/src/intermediate_representation, code_producers): because circom
rejects constraints/signals under unknown control flow
(type_analysis unknown_known_analysis) the whole witness computation
flattens at compile time into one dataflow DAG of field operations over the
input signals — the TPU-native form.  Data-dependent `?:`/if over witness
values become `select` nodes; data-dependent `while` loops unroll with
predication and a runtime guard (executor._exec_while_predicated);
witness-dependent pow/shl/shr/mod lower to primitive ops and idiv runs
as limb-level long division (backend/dynops.py).

Nodes are hash-consed (CSE).  Ops carry an optional static immediate
(shift amounts, exponents) so the JAX backend can specialize.
"""

from dataclasses import dataclass

# opcode -> arity (excluding immediates)
OPS = {
    "const": 0, "input": 0,
    "add": 2, "sub": 2, "mul": 2, "div": 2, "idiv": 2, "mod": 2,
    "pow": 2, "shl": 2, "shr": 2,
    "lt": 2, "le": 2, "gt": 2, "ge": 2, "eq": 2, "neq": 2,
    "land": 2, "lor": 2, "band": 2, "bor": 2, "bxor": 2,
    "neg": 1, "lnot": 1, "bnot": 1,
    "shl_k": 1, "shr_k": 1, "pow_k": 1,   # imm = static shift/exponent
    "select": 3,                           # (cond, if_true, if_false)
}


@dataclass(frozen=True, slots=True)
class TapeRef:
    id: int


class Tape:
    """SSA node list; node i: (op, operand ids tuple, imm)."""

    def __init__(self, p: int):
        self.p = p
        self.ops: list[str] = []
        self.args: list[tuple] = []
        self.imms: list = []
        self._cse: dict = {}
        self.n_inputs = 0
        self.outputs: list[int] = []     # node ids in witness order
        self.n_guards = 0    # trailing outputs = while-unroll guards
        # node id -> (lo, hi) signed range asserted by signal TAGS
        # (binary / valued maxbit, recorded by the executor); author
        # assertions, same contract as the reference's exported tags
        self.node_hints = {}

    def __len__(self):
        return len(self.ops)

    def _push(self, op, args, imm=None) -> TapeRef:
        key = (op, args, imm)
        hit = self._cse.get(key)
        if hit is not None:
            return TapeRef(hit)
        nid = len(self.ops)
        self.ops.append(op)
        self.args.append(args)
        self.imms.append(imm)
        self._cse[key] = nid
        return TapeRef(nid)

    def const(self, value: int) -> TapeRef:
        return self._push("const", (), value % self.p)

    def input(self, index: int) -> TapeRef:
        self.n_inputs = max(self.n_inputs, index + 1)
        return self._push("input", (), index)

    def emit(self, op: str, *operands, imm=None) -> TapeRef:
        args = tuple(o.id for o in operands)
        assert len(args) == OPS[op], (op, args)
        return self._push(op, args, imm)

    def set_outputs(self, refs):
        self.outputs = [r.id for r in refs]

    def stats(self):
        from collections import Counter

        return dict(Counter(self.ops))
