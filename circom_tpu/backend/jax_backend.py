"""JAX backend: compile a witness tape into a batched TPU program.

Replaces the reference's code_producers (WASM/C++ emission): the tape runs
as ONE XLA program, batch axis = independent witnesses.

Key design points (TPU-first):

* Every tape op is a fully-batched VPU op over ``uint32[batch, L]`` limb
  planes; with batches of thousands, a single op saturates the VPU, so ops
  execute sequentially via ``lax.scan`` over a static instruction table.
  XLA graph size is O(#opcode branches), independent of circuit size —
  SHA256-class tapes (100k+ ops) compile in constant graph size.
* A domain-assignment pass rewrites the tape so mul/div chains run in
  Montgomery form and comparisons/bit ops in canonical form, inserting
  (cached) conversions at boundaries — Poseidon-style circuits pay zero
  conversions inside the hot loop.
* Registers are reused via linear-scan liveness, bounding the register
  file (R, batch, L) to the live width of the DAG.
* Small tapes skip scan and unroll directly (XLA fuses everything).

Sharding: all ops are elementwise over the batch axis, so sharding the
inputs' batch dimension over a mesh runs multi-chip with zero collectives
(see circom_tpu/parallel/mesh.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..field.primes import LIMB_BITS, FieldSpec
from ..ops.jfield import MASK, JaxField
from .tape import OPS, Tape

MONT = 0
NORM = 1

# required operand/result domains: None = any/inherit
_OP_DOMAIN = {
    "mul": MONT, "div": MONT, "pow_k": MONT, "pow": MONT,
    "lt": NORM, "le": NORM, "gt": NORM, "ge": NORM, "eq": NORM,
    "neq": NORM, "land": NORM, "lor": NORM, "lnot": NORM,
    "band": NORM, "bor": NORM, "bxor": NORM, "bnot": NORM,
    "shl_k": NORM, "shr_k": NORM, "shl": NORM, "shr": NORM,
    "idiv": NORM, "mod": NORM,
}
_FLEX_OPS = {"add", "sub", "neg", "select"}
# result domain of NORM-required ops is NORM; of MONT ops is MONT
_UNSUPPORTED_JAX = {"shl", "shr", "idiv", "mod", "pow"}


class DomainTape:
    """Tape after domain assignment: ops + per-node domain + conversions."""

    def __init__(self, tape: Tape):
        self.src = tape
        self.ops = []
        self.args = []
        self.imms = []
        self.domains = []
        self.n_inputs = tape.n_inputs
        self.outputs = []
        self._build(tape)

    def _build(self, tape: Tape):
        n = len(tape.ops)
        dom = [None] * n
        # forward pass: fix domains
        for i in range(n):
            op = tape.ops[i]
            if op == "const":
                dom[i] = None  # materialized per use
            elif op == "input":
                dom[i] = NORM
            elif op in _OP_DOMAIN:
                dom[i] = MONT if _OP_DOMAIN[op] == MONT else NORM
                if op in ("lt", "le", "gt", "ge", "eq", "neq", "land",
                          "lor", "lnot", "band", "bor", "bxor", "bnot",
                          "shl_k", "shr_k"):
                    dom[i] = NORM
            else:  # flexible: majority of operand domains, default MONT
                ds = [dom[a] for a in tape.args[i]]
                known = [d for d in ds if d is not None]
                if not known:
                    dom[i] = MONT
                else:
                    dom[i] = MONT if known.count(MONT) * 2 >= len(known) \
                        else NORM
        # emission with conversion insertion
        new_id = {}       # (src_id, domain) -> new node id
        self._new_ops = self.ops

        def emit(op, args, imm, domain):
            nid = len(self.ops)
            self.ops.append(op)
            self.args.append(tuple(args))
            self.imms.append(imm)
            self.domains.append(domain)
            return nid

        def get_in(src_id, want):
            d = dom[src_id]
            op = tape.ops[src_id]
            if op == "const":
                w = want if want is not None else NORM
                key = (src_id, w)
                if key not in new_id:
                    new_id[key] = emit("const", (), tape.imms[src_id], w)
                return new_id[key]
            if want is None or d == want or d is None:
                return new_id[(src_id, d)]
            key = (src_id, want)
            if key not in new_id:
                conv = "to_mont" if want == MONT else "from_mont"
                new_id[key] = emit(conv, (new_id[(src_id, d)],), None, want)
            return new_id[key]

        for i in range(n):
            op = tape.ops[i]
            if op == "const":
                continue  # materialized lazily per domain
            if op == "input":
                new_id[(i, NORM)] = emit("input", (), tape.imms[i], NORM)
                continue
            if op == "select":
                c, a, b = tape.args[i]
                d = dom[i]
                args = (get_in(c, None), get_in(a, d), get_in(b, d))
            elif op in _OP_DOMAIN:
                want = _OP_DOMAIN[op]
                args = tuple(get_in(a, want) for a in tape.args[i])
            else:
                d = dom[i]
                args = tuple(get_in(a, d) for a in tape.args[i])
            new_id[(i, dom[i])] = emit(op, args, tape.imms[i], dom[i])

        for out in tape.outputs:
            self.outputs.append(get_in(out, NORM))


_BRANCH_OPS = [
    "const_or_input",  # never executed; placeholder id 0
    "add", "sub", "mul", "div", "neg",
    "lt", "le", "gt", "ge", "eq", "neq",
    "land", "lor", "lnot", "band", "bor", "bxor", "bnot",
    "shl_k", "shr_k", "pow_k", "select", "to_mont", "from_mont",
]
_OPCODE_ID = {op: i for i, op in enumerate(_BRANCH_OPS)}


class WitnessProgram:
    """Executable form of a tape for one field."""

    def __init__(self, tape: Tape, spec: FieldSpec, unroll_threshold=256):
        for op in set(tape.ops):
            if op in _UNSUPPORTED_JAX:
                raise NotImplementedError(
                    f"tape op '{op}' not supported by the JAX backend yet "
                    "(use the host witness calculator)"
                )
        self.spec = spec
        self.jf = JaxField(spec)
        self.dt = DomainTape(tape)
        self.n_inputs = tape.n_inputs
        self.unroll = len(self.dt.ops) <= unroll_threshold
        self._allocate()
        self._jit = None

    # -- register allocation (linear scan with reuse) --------------------
    def _allocate(self):
        dt = self.dt
        n = len(dt.ops)
        last_use = [i for i in range(n)]
        for i in range(n):
            for a in dt.args[i]:
                last_use[a] = i
        for o in dt.outputs:
            last_use[o] = n  # outputs live to the end
        reg_of = [None] * n
        free = []
        next_reg = 0
        steps = []
        const_loads = []   # (reg, value, domain)
        input_loads = []   # (reg, input_index)
        expiring = [[] for _ in range(n + 1)]
        # consts/inputs are loaded into the register file at time 0, so
        # their registers must be allocated up front (lifetime [0, last_use])
        # or an earlier step could clobber them.
        for i in range(n):
            op = dt.ops[i]
            if op not in ("const", "input"):
                continue
            reg = next_reg
            next_reg += 1
            reg_of[i] = reg
            if last_use[i] < n:
                expiring[last_use[i] + 1].append(reg)
            if op == "const":
                const_loads.append((reg, dt.imms[i], dt.domains[i]))
            else:
                input_loads.append((reg, dt.imms[i]))
        for i in range(n):
            # free registers whose last use was before i
            for r in expiring[i]:
                free.append(r)
            op = dt.ops[i]
            if op in ("const", "input"):
                continue
            if free:
                reg = free.pop()
            else:
                reg = next_reg
                next_reg += 1
            reg_of[i] = reg
            if last_use[i] < n:
                expiring[last_use[i] + 1].append(reg)
            args = [reg_of[a] for a in dt.args[i]]
            while len(args) < 3:
                args.append(0)
            imm = dt.imms[i] if dt.imms[i] is not None else 0
            if imm >= 2 ** 31:
                raise NotImplementedError(
                    f"immediate too large for op '{op}' "
                    "(use the host witness calculator)"
                )
            steps.append((_OPCODE_ID[op], args[0], args[1], args[2],
                          reg, imm))
        self.n_regs = max(next_reg, 1)
        self.steps = np.asarray(steps, dtype=np.int32) if steps else \
            np.zeros((0, 6), np.int32)
        self.const_loads = const_loads
        self.input_loads = input_loads
        self.out_regs = np.asarray([reg_of[o] for o in dt.outputs],
                                   dtype=np.int32)

    # -- branch library --------------------------------------------------
    def _branches(self):
        jf = self.jf
        L = jf.L

        def shr_dyn(a, k):
            q = (k // LIMB_BITS).astype(jnp.uint32)
            r = (k % LIMB_BITS).astype(jnp.uint32)
            idx = jnp.arange(L, dtype=jnp.uint32) + q
            valid = idx < L
            idxc = jnp.minimum(idx, L - 1).astype(jnp.int32)
            g = jnp.where(valid, a[..., idxc], 0)
            idx2 = idx + 1
            valid2 = idx2 < L
            idx2c = jnp.minimum(idx2, L - 1).astype(jnp.int32)
            g2 = jnp.where(valid2, a[..., idx2c], 0)
            return (g >> r) | ((g2 << (LIMB_BITS - r)) & MASK)

        def shl_dyn(a, k):
            q = (k // LIMB_BITS).astype(jnp.int32)
            r = (k % LIMB_BITS).astype(jnp.uint32)
            idx = jnp.arange(L, dtype=jnp.int32) - q
            valid = idx >= 0
            idxc = jnp.maximum(idx, 0)
            g = jnp.where(valid, a[..., idxc], 0)
            idx2 = idx - 1
            valid2 = idx2 >= 0
            idx2c = jnp.maximum(idx2, 0)
            g2 = jnp.where(valid2, a[..., idx2c], 0)
            res = (((g << r) & MASK) | (g2 >> (LIMB_BITS - r))) \
                & jf.mask_limbs
            return jf._cond_sub_p(res, jnp.zeros(res.shape[:-1], jnp.uint32))

        def pow_dyn(a, e):
            # e: uint32 scalar exponent (static per-step value, traced)
            def body(i, acc):
                acc = jf.mont_mul(acc, acc)
                bit = (e >> (31 - i)) & 1
                return jnp.where(bit.astype(bool), jf.mont_mul(acc, a), acc)

            init = jnp.broadcast_to(jf.one_mont, a.shape)
            return lax.fori_loop(0, 32, body, init)

        def select(c, a, b):
            return jf.select_bool(jf.as_bool(c), a, b)

        two = lambda f: (lambda a, b, c, k: f(a, b))
        one = lambda f: (lambda a, b, c, k: f(a))

        return [
            lambda a, b, c, k: a,                      # placeholder
            two(jf.add), two(jf.sub), two(jf.mont_mul), two(jf.div_mont),
            one(jf.neg),
            two(jf.lt), two(jf.le), two(jf.gt), two(jf.ge),
            two(jf.eq), two(jf.neq),
            two(jf.bool_and), two(jf.bool_or), one(jf.bool_not),
            two(jf.bit_and), two(jf.bit_or), two(jf.bit_xor),
            one(jf.complement),
            lambda a, b, c, k: shl_dyn(a, k),
            lambda a, b, c, k: shr_dyn(a, k),
            lambda a, b, c, k: pow_dyn(a, k),
            lambda a, b, c, k: select(a, b, c),
            one(jf.to_mont), one(jf.from_mont),
        ]

    # -- program ---------------------------------------------------------
    def _run(self, inputs):
        """inputs: uint32 (n_inputs, batch, L) -> (n_outputs, batch, L)."""
        jf = self.jf
        batch = inputs.shape[1]
        L = jf.L
        rf = jnp.zeros((self.n_regs, batch, L), jnp.uint32)
        from ..ops.limbs import int_to_limbs

        R = 1 << (LIMB_BITS * L)
        for (reg, value, domain) in self.const_loads:
            v = value if domain != MONT else (value * R) % jf.p
            limbs = jnp.asarray(int_to_limbs(v, L))
            rf = rf.at[reg].set(jnp.broadcast_to(limbs, (batch, L)))
        for (reg, idx) in self.input_loads:
            rf = rf.at[reg].set(inputs[idx])
        branches = self._branches()
        if self.unroll:
            # direct emission; static imms allow specialised shifts
            vals = {}
            for (op, a, b, c, out, imm) in self.steps:
                fa, fb, fc = rf[a], rf[b], rf[c]
                fa = vals.get(a, fa)
                fb = vals.get(b, fb)
                fc = vals.get(c, fc)
                res = branches[op](fa, fb, fc, jnp.uint32(imm))
                vals[out] = res
            outs = []
            for r in self.out_regs:
                outs.append(vals.get(int(r), rf[int(r)]))
            return jnp.stack(outs, axis=0)

        steps = jnp.asarray(self.steps)

        def body(rfc, instr):
            op, a, b, c, out, imm = (instr[0], instr[1], instr[2],
                                     instr[3], instr[4], instr[5])
            fa = rfc[a]
            fb = rfc[b]
            fc = rfc[c]
            res = lax.switch(op, branches, fa, fb, fc,
                             imm.astype(jnp.uint32))
            rfc = lax.dynamic_update_index_in_dim(rfc, res, out, 0)
            return rfc, None

        rf, _ = lax.scan(body, rf, steps)
        return rf[self.out_regs]

    def run(self, inputs):
        """inputs: uint32 array (n_inputs, batch, L)."""
        if self._jit is None:
            self._jit = jax.jit(self._run)
        return self._jit(inputs)

    def jittable(self):
        return self._run

    # -- host-side convenience ------------------------------------------
    def encode_inputs(self, columns):
        """columns: list (len n_inputs) of lists of ints (len batch)
        -> uint32 (n_inputs, batch, L)."""
        from ..ops.limbs import ints_to_limbs

        L = self.jf.L
        arrs = [ints_to_limbs(col, L) for col in columns]
        return np.stack(arrs, axis=0)

    def decode_outputs(self, arr):
        """(n_outputs, batch, L) -> list of lists of ints [output][batch]."""
        from ..ops.limbs import limbs_to_int

        arr = np.asarray(arr)
        return [
            [limbs_to_int(arr[i, j]) for j in range(arr.shape[1])]
            for i in range(arr.shape[0])
        ]
