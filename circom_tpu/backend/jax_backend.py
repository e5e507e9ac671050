"""JAX backend: compile a witness tape into a batched TPU program.

Replaces the reference's code_producers (WASM/C++ emission): the tape runs
as ONE XLA program, batch axis = independent witnesses.

TPU-first design:

* Every tape op is a fully-batched VPU op over ``uint32[batch, L]`` limb
  planes.  Independent ops of the same opcode at the same dataflow level
  are PACKED into one vector step of up to ``slots`` lanes — one gather /
  one field-op / one scatter on ``uint32[S, batch, L]`` — so per-step
  overhead amortizes and the MDS-style intra-round parallelism of hash
  circuits is exploited on top of the batch axis.
* Steps execute via ``lax.scan`` over static instruction tables with a
  ``lax.switch`` restricted to the opcodes actually present: XLA graph
  size is O(#distinct opcodes), independent of circuit size.
* A domain-assignment pass runs mul/div chains in Montgomery form and
  comparisons/bit ops in canonical form, inserting cached conversions at
  boundaries (zero conversions inside Poseidon-style mul/add circuits).
* Registers are reused via linear-scan liveness over the packed schedule.
* Small tapes skip scan and unroll directly (XLA fuses everything).

Sharding: all ops are elementwise over the batch axis; sharding the
inputs' batch dimension over a mesh runs multi-chip with zero collectives
(circom_tpu/parallel/mesh.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..field.primes import LIMB_BITS, FieldSpec
from ..ops.jfield import MASK, JaxField, on_tpu
from .tape import OPS, Tape

MONT = 0
NORM = 1

_NORM_OPS = {
    "lt", "le", "gt", "ge", "eq", "neq", "land", "lor", "lnot",
    "band", "bor", "bxor", "bnot", "shl_k", "shr_k", "shl", "shr",
    "idiv", "mod",
}
_MONT_OPS = {"mul", "div", "pow_k", "pow"}
# every tape op is executable: witness-dependent pow/shl/shr/mod are
# LOWERED to primitive ops first (backend/dynops.py), idiv runs as
# limb-level long division in every backend
_UNSUPPORTED_JAX = set()


class DomainTape:
    """Tape after domain assignment: ops + per-node domain + conversions.

    ``narrow``: source-node ids proven int32-representable by
    backend/ranges.py — they are pinned to the canonical (NORM) domain
    so no Montgomery conversions are inserted around them, and their
    muls are flagged plain (executed on the narrow int32 lane by the
    interpreter backend)."""

    def __init__(self, tape: Tape, narrow=None, plain_field=False,
                 node_rng=None):
        self.src = tape
        self.ops = []
        self.args = []
        self.imms = []
        self.domains = []
        self.narrow = []
        self.n_inputs = tape.n_inputs
        self.outputs = []
        self.plain_field = plain_field
        # carried source-tape intervals for NORM-domain nodes keyed by
        # THIS tape's node ids — lets the planner skip its duplicate
        # range analysis on mapped nodes (the tape-level analysis in
        # backend/ranges.py subsumes the plan-level rules for them)
        self.node_rng = {}
        self._src_rng = node_rng
        self._build(tape, narrow or frozenset())
        self._src_rng = None

    def _build(self, tape: Tape, narrow_src):
        n = len(tape.ops)
        dom = [None] * n
        plain = set()
        for i in range(n):
            op = tape.ops[i]
            if self.plain_field:
                # goldilocks-class fields run every value in canonical
                # form: products fold instead of Montgomery-reducing
                # (ops/limb_emit.gl_mul), so conversions never pay off.
                # div/pow keep Montgomery islands (inversion chains are
                # rare; every backend handles them uniformly).
                if op == "const":
                    dom[i] = None
                elif op in ("div", "pow_k", "pow"):
                    dom[i] = MONT
                else:
                    dom[i] = NORM
                    if op == "mul":
                        plain.add(i)
                continue
            if op == "const":
                dom[i] = None  # materialized per use
            elif op == "input":
                dom[i] = NORM
            elif i in narrow_src:
                dom[i] = NORM  # narrow values live in canonical form
            elif op == "mul" and any(
                    tape.ops[a] == "const" for a in tape.args[i]) and all(
                    tape.ops[a] == "const" or a in narrow_src
                    for a in tape.args[i]):
                # narrow-value * wide-constant (bit-lincomb tails, e.g.
                # sum(bit*2^k) in SHA adders): a single plain montmul
                # with the constant pre-scaled by R beats
                # to_mont + Montgomery mul, and keeps the consuming add
                # chain in canonical form.
                dom[i] = NORM
                plain.add(i)
            elif op in _MONT_OPS:
                dom[i] = MONT
            elif op in _NORM_OPS:
                dom[i] = NORM
            else:  # flexible (add/sub/neg/select): majority, default MONT
                ds = [dom[a] for a in tape.args[i]]
                known = [d for d in ds if d is not None]
                if not known:
                    dom[i] = MONT
                else:
                    dom[i] = MONT if known.count(MONT) * 2 >= len(known) \
                        else NORM
        new_id = {}

        def emit(op, args, imm, domain, is_narrow=False):
            nid = len(self.ops)
            self.ops.append(op)
            self.args.append(tuple(args))
            self.imms.append(imm)
            self.domains.append(domain)
            self.narrow.append(is_narrow)
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
            if want is None or d == want:
                return new_id[(src_id, d)]
            key = (src_id, want)
            if key not in new_id:
                conv = "to_mont" if want == MONT else "from_mont"
                new_id[key] = emit(conv, (new_id[(src_id, d)],), None, want)
            return new_id[key]

        for i in range(n):
            op = tape.ops[i]
            if op == "const":
                continue
            if op == "input":
                new_id[(i, NORM)] = emit("input", (), tape.imms[i], NORM)
                continue
            is_nrw = i in narrow_src
            is_plain = is_nrw or i in plain
            if op == "select":
                c, a, b = tape.args[i]
                d = dom[i]
                args = (get_in(c, None), get_in(a, d), get_in(b, d))
            elif op in _MONT_OPS and not is_plain:
                args = tuple(get_in(a, MONT) for a in tape.args[i])
            elif op in _NORM_OPS or is_plain:
                args = tuple(get_in(a, NORM) for a in tape.args[i])
            else:
                d = dom[i]
                args = tuple(get_in(a, d) for a in tape.args[i])
            op_out = "mulp" if (op == "mul" and is_plain) else op
            nid = emit(op_out, args, tape.imms[i], dom[i], is_nrw)
            new_id[(i, dom[i])] = nid
            if dom[i] == NORM and self._src_rng is not None:
                # identity-mapped NORM node: its raw value IS the
                # logical value, so the tape-level interval (possibly
                # None = proven nothing) transfers verbatim; MONT
                # nodes and inserted conversions are NOT seeded so the
                # planner's view of them is unchanged
                self.node_rng[nid] = self._src_rng[i]

        for out in tape.outputs:
            self.outputs.append(get_in(out, NORM))


class WitnessProgram:
    """Executable form of a tape for one field."""

    def __init__(self, tape: Tape, spec: FieldSpec, unroll_threshold=4096,
                 slots=8, mode="auto", input_ranges=None):
        from .dynops import lower_dynamic_ops

        tape = lower_dynamic_ops(tape)
        self.spec = spec
        self.jf = JaxField(spec)
        from .ranges import narrow_nodes

        self.input_ranges = input_ranges or {}
        nset, _rng = narrow_nodes(tape, self.input_ranges)
        from ..ops.limb_emit import GOLDILOCKS_P

        self.dt = DomainTape(tape, narrow=nset,
                             plain_field=spec.p == GOLDILOCKS_P,
                             node_rng=_rng)
        self.n_inputs = tape.n_inputs
        self.slots = max(1, slots)
        # fused-Pallas paths (production TPU backends): the in-kernel
        # interpreter (backend/interp.py, O(1) compile in circuit size)
        # first, unrolled segments (backend/segments.py, small tapes
        # incl. static shifts) second; per-op/scan paths remain as
        # fallbacks and as the CPU test path.
        self._mode = mode
        self.fused = None
        if mode in ("auto", "interp"):
            try:
                from .interp import InterpreterProgram

                self.fused = InterpreterProgram(
                    self.dt, spec, input_ranges=self.input_ranges)
            except NotImplementedError:
                if mode == "interp":
                    raise
        if self.fused is None and mode in ("auto", "segments"):
            try:
                from .segments import SegmentedProgram

                self.fused = SegmentedProgram(self.dt, spec)
            except NotImplementedError:
                if mode == "segments":
                    raise
        # straight-line SSA emission for small/medium tapes: field ops are
        # single fused Pallas kernels on TPU, XLA keeps buffers in place
        # (loop-carried register files force whole-buffer copies per step).
        self.unroll = len(self.dt.ops) <= unroll_threshold
        self.n_witness = len(self.dt.outputs)
        # trailing guard outputs from predicated while unrolling: the
        # caller must check these rows are zero (see pipeline.build_tape)
        self.n_guards = getattr(tape, "n_guards", 0)
        # scan-path tables plan LAZILY: when a fused backend serves the
        # run, the packer/allocator never pays (SHA-class planning cost)
        self.n_steps = 0
        self._scan_planned = False
        if not self.unroll and self.fused is None:
            self._ensure_scan_tables()
        self._jit = None

    def _ensure_scan_tables(self):
        if not self._scan_planned and not self.unroll:
            self._schedule_and_allocate()
            self._scan_planned = True

    # -- schedule: pack same-(level, opcode) nodes into vector steps -----
    def _schedule_and_allocate(self):
        dt = self.dt
        n = len(dt.ops)
        S = self.slots
        level = [0] * n
        compute_nodes = []
        for i in range(n):
            if dt.ops[i] in ("const", "input"):
                level[i] = 0
                continue
            lv = 0
            for a in dt.args[i]:
                lv = max(lv, level[a] + 1)
            level[i] = lv
            compute_nodes.append(i)
        # group by (level, opcode); deterministic order
        compute_nodes.sort(key=lambda i: (level[i], dt.ops[i], i))
        steps_nodes = []  # list of (opcode, [node ids])
        j = 0
        while j < len(compute_nodes):
            i0 = compute_nodes[j]
            key = (level[i0], dt.ops[i0])
            k = j
            while (k < len(compute_nodes)
                   and (level[compute_nodes[k]], dt.ops[compute_nodes[k]])
                   == key and k - j < S):
                k += 1
            steps_nodes.append((dt.ops[i0], compute_nodes[j:k]))
            j = k
        # schedule position of each node (step index; loads at -1)
        pos = [-1] * n
        for si, (_op, nodes) in enumerate(steps_nodes):
            for i in nodes:
                pos[i] = si
        # witness positions per node: step-produced nodes stream their
        # value into the output buffer at their own step, so being an
        # output does NOT extend register liveness.
        out_pos = {}
        for w_idx, o in enumerate(dt.outputs):
            out_pos.setdefault(o, []).append(w_idx)
        self.n_witness = len(dt.outputs)
        # liveness over step positions
        last_use = [pos[i] for i in range(n)]
        for i in range(n):
            for a in dt.args[i]:
                last_use[a] = max(last_use[a], pos[i])
        INF = len(steps_nodes) + 1
        for o in dt.outputs:
            if dt.ops[o] in ("const", "input"):
                last_use[o] = INF  # loads: copied to the out buffer at init
        reg_of = [None] * n
        free = []
        next_reg = 0
        expiring = [[] for _ in range(len(steps_nodes) + 2)]
        const_loads, input_loads = [], []
        for i in range(n):
            if dt.ops[i] in ("const", "input"):
                reg = next_reg
                next_reg += 1
                reg_of[i] = reg
                if last_use[i] < INF:
                    expiring[last_use[i] + 1].append(reg)
                if dt.ops[i] == "const":
                    const_loads.append((reg, dt.imms[i], dt.domains[i]))
                else:
                    input_loads.append((reg, dt.imms[i]))
        for si, (_opname, nodes) in enumerate(steps_nodes):
            for r in expiring[si]:
                free.append(r)
            for i in nodes:
                reg = free.pop() if free else next_reg
                if reg == next_reg:
                    next_reg += 1
                reg_of[i] = reg
                if last_use[i] < INF:
                    expiring[last_use[i] + 1].append(reg)
        self.n_regs = next_reg + 1  # +1 trash register for padding slots
        trash = next_reg
        # opcode table restricted to present ops
        present = sorted({op for (op, _nodes) in steps_nodes})
        self.branch_ops = present
        op_id = {op: k for k, op in enumerate(present)}
        n_steps = len(steps_nodes)
        opc = np.zeros(n_steps, np.int32)
        a_i = np.zeros((n_steps, S), np.int32)
        b_i = np.zeros((n_steps, S), np.int32)
        c_i = np.zeros((n_steps, S), np.int32)
        o_i = np.full((n_steps, S), trash, np.int32)
        # witness stream: destination row in the output buffer per slot
        # (n_witness = trash row)
        w_i = np.full((n_steps, S), self.n_witness, np.int32)
        imm = np.zeros((n_steps, S), np.int64)
        out_dups = []   # (src_witness_pos, dst_witness_pos) extra copies
        load_outputs = []  # (reg, [witness positions]) for const/input outs
        for i in range(n):
            if dt.ops[i] in ("const", "input") and i in out_pos:
                load_outputs.append((None, i, out_pos[i]))
        for si, (opname, nodes) in enumerate(steps_nodes):
            opc[si] = op_id[opname]
            for sj, i in enumerate(nodes):
                args = dt.args[i]
                if len(args) > 0:
                    a_i[si, sj] = reg_of[args[0]]
                if len(args) > 1:
                    b_i[si, sj] = reg_of[args[1]]
                if len(args) > 2:
                    c_i[si, sj] = reg_of[args[2]]
                o_i[si, sj] = reg_of[i]
                if i in out_pos:
                    positions = out_pos[i]
                    w_i[si, sj] = positions[0]
                    for d in positions[1:]:
                        out_dups.append((positions[0], d))
                v = dt.imms[i]
                if v is not None:
                    if v >= 2 ** 31:
                        raise NotImplementedError(
                            f"immediate too large for op '{opname}'")
                    imm[si, sj] = v
        self.tables = (opc, a_i, b_i, c_i, o_i, w_i, imm.astype(np.int32))
        self.const_loads = const_loads
        self.input_loads = input_loads
        self.out_dups = out_dups
        self.load_outputs = [
            (reg_of[i], positions) for (_x, i, positions) in load_outputs
        ]
        self.out_regs = np.asarray([reg_of[o] for o in dt.outputs], np.int32)
        self.n_steps = n_steps

    # -- branch library: each takes (a, b, c, imm) with shapes
    #    (S, batch, L) / imm (S,) and returns (S, batch, L) --------------
    def _branch(self, opname):
        jf = self.jf
        L = jf.L

        def shr_dyn(a, k):
            # per-slot dynamic right shift, k: (S,) uint32 in [0, bits)
            # a: (S, L, B) limb-major
            q = (k // LIMB_BITS).astype(jnp.int32)[:, None, None]
            r = (k % LIMB_BITS).astype(jnp.uint32)[:, None, None]
            idx = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :, None] + q, a.shape)
            g = jnp.take_along_axis(a, jnp.minimum(idx, L - 1), axis=-2)
            g = jnp.where(idx < L, g, 0)
            idx2 = idx + 1
            g2 = jnp.take_along_axis(a, jnp.minimum(idx2, L - 1), axis=-2)
            g2 = jnp.where(idx2 < L, g2, 0)
            return (g >> r) | ((g2 << (LIMB_BITS - r)) & MASK)

        def shl_dyn(a, k):
            q = (k // LIMB_BITS).astype(jnp.int32)[:, None, None]
            r = (k % LIMB_BITS).astype(jnp.uint32)[:, None, None]
            idx = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :, None] - q, a.shape)
            g = jnp.take_along_axis(a, jnp.maximum(idx, 0), axis=-2)
            g = jnp.where(idx >= 0, g, 0)
            idx2 = idx - 1
            g2 = jnp.take_along_axis(a, jnp.maximum(idx2, 0), axis=-2)
            g2 = jnp.where(idx2 >= 0, g2, 0)
            res = (((g << r) & MASK) | (g2 >> (LIMB_BITS - r))) \
                & jf.mask_limbs
            return jf._cond_sub_p(
                res, jnp.zeros(res.shape[:-2] + res.shape[-1:], jnp.uint32))

        def pow_dyn(a, e):
            e = e.astype(jnp.uint32)[:, None, None]

            def body(i, acc):
                acc = jf.mont_mul(acc, acc)
                bit = ((e >> (31 - i)) & 1).astype(bool)
                return jnp.where(bit, jf.mont_mul(acc, a), acc)

            init = jnp.broadcast_to(jf.one_mont, a.shape)
            return lax.fori_loop(0, 32, body, init)

        table = {
            "add": lambda a, b, c, k: jf.add(a, b),
            "sub": lambda a, b, c, k: jf.sub(a, b),
            "mul": lambda a, b, c, k: jf.mont_mul(a, b),
            "mulp": lambda a, b, c, k: jf.mul_norm(a, b),
            "div": lambda a, b, c, k: jf.div_mont(a, b),
            "neg": lambda a, b, c, k: jf.neg(a),
            "lt": lambda a, b, c, k: jf.lt(a, b),
            "le": lambda a, b, c, k: jf.le(a, b),
            "gt": lambda a, b, c, k: jf.gt(a, b),
            "ge": lambda a, b, c, k: jf.ge(a, b),
            "eq": lambda a, b, c, k: jf.eq(a, b),
            "neq": lambda a, b, c, k: jf.neq(a, b),
            "land": lambda a, b, c, k: jf.bool_and(a, b),
            "lor": lambda a, b, c, k: jf.bool_or(a, b),
            "lnot": lambda a, b, c, k: jf.bool_not(a),
            "band": lambda a, b, c, k: jf.bit_and(a, b),
            "bor": lambda a, b, c, k: jf.bit_or(a, b),
            "bxor": lambda a, b, c, k: jf.bit_xor(a, b),
            "bnot": lambda a, b, c, k: jf.complement(a),
            "shl_k": lambda a, b, c, k: shl_dyn(a, k),
            "shr_k": lambda a, b, c, k: shr_dyn(a, k),
            "pow_k": lambda a, b, c, k: pow_dyn(a, k),
            "idiv": lambda a, b, c, k: jf.idiv(a, b),
            "mod": lambda a, b, c, k: jf.imod(a, b),
            "select": lambda a, b, c, k: jf.select_bool(jf.as_bool(a), b, c),
            "to_mont": lambda a, b, c, k: jf.to_mont(a),
            "from_mont": lambda a, b, c, k: jf.from_mont(a),
        }
        return table[opname]

    # -- program ---------------------------------------------------------
    def _init_regfile(self, inputs):
        """inputs: uint32 (n_inputs, L, batch) — limb-major, batch-minor."""
        jf = self.jf
        batch = inputs.shape[2]
        L = jf.L
        from ..ops.limbs import int_to_limbs

        R = 1 << (LIMB_BITS * L)
        rf = np.zeros((self.n_regs, L, 1), np.uint32)
        for (reg, value, domain) in self.const_loads:
            v = value if domain != MONT else (value * R) % jf.p
            rf[reg, :, 0] = int_to_limbs(v, L)
        rf = jnp.broadcast_to(jnp.asarray(rf), (self.n_regs, L, batch))
        if self.input_loads:
            regs = jnp.asarray([r for (r, _) in self.input_loads])
            idxs = jnp.asarray([i for (_, i) in self.input_loads])
            rf = rf.at[regs].set(inputs[idxs])
        return rf

    def _run_ssa(self, inputs):
        """Straight-line per-node emission: values are SSA jnp arrays,
        muls/adds/subs are single Pallas kernels on TPU."""
        jf = self.jf
        dt = self.dt
        batch = inputs.shape[2]
        L = jf.L
        from ..ops.limbs import int_to_limbs

        R = 1 << (LIMB_BITS * L)
        vals = {}
        for i, op in enumerate(dt.ops):
            args = dt.args[i]
            imm = dt.imms[i]
            if op == "const":
                v = imm if dt.domains[i] != MONT else (imm * R) % jf.p
                vals[i] = np.asarray(int_to_limbs(v, L))[:, None]
            elif op == "input":
                vals[i] = inputs[imm]
            elif op == "mul":
                vals[i] = jf.mont_mul(vals[args[0]], vals[args[1]])
            elif op == "mulp":
                vals[i] = jf.mul_norm(vals[args[0]], vals[args[1]])
            elif op == "add":
                vals[i] = jf.add(vals[args[0]], vals[args[1]])
            elif op == "sub":
                vals[i] = jf.sub(vals[args[0]], vals[args[1]])
            elif op == "neg":
                vals[i] = jf.neg(vals[args[0]])
            elif op == "div":
                vals[i] = jf.div_mont(vals[args[0]], vals[args[1]])
            elif op == "idiv":
                vals[i] = jf.idiv(vals[args[0]], vals[args[1]])
            elif op == "mod":
                vals[i] = jf.imod(vals[args[0]], vals[args[1]])
            elif op == "to_mont":
                vals[i] = jf.to_mont(vals[args[0]])
            elif op == "from_mont":
                vals[i] = jf.from_mont(vals[args[0]])
            elif op == "pow_k":
                vals[i] = jf.pow_mont(vals[args[0]], imm)
            elif op == "shl_k":
                vals[i] = jf.shift_l_const(vals[args[0]], imm)
            elif op == "shr_k":
                vals[i] = jf.shift_r_const(vals[args[0]], imm)
            elif op == "select":
                vals[i] = jf.select(vals[args[0]], vals[args[1]],
                                    vals[args[2]])
            elif op == "band":
                vals[i] = jf.bit_and(vals[args[0]], vals[args[1]])
            elif op == "bor":
                vals[i] = jf.bit_or(vals[args[0]], vals[args[1]])
            elif op == "bxor":
                vals[i] = jf.bit_xor(vals[args[0]], vals[args[1]])
            elif op == "bnot":
                vals[i] = jf.complement(vals[args[0]])
            elif op == "lt":
                vals[i] = jf.lt(vals[args[0]], vals[args[1]])
            elif op == "le":
                vals[i] = jf.le(vals[args[0]], vals[args[1]])
            elif op == "gt":
                vals[i] = jf.gt(vals[args[0]], vals[args[1]])
            elif op == "ge":
                vals[i] = jf.ge(vals[args[0]], vals[args[1]])
            elif op == "eq":
                vals[i] = jf.eq(vals[args[0]], vals[args[1]])
            elif op == "neq":
                vals[i] = jf.neq(vals[args[0]], vals[args[1]])
            elif op == "land":
                vals[i] = jf.bool_and(vals[args[0]], vals[args[1]])
            elif op == "lor":
                vals[i] = jf.bool_or(vals[args[0]], vals[args[1]])
            elif op == "lnot":
                vals[i] = jf.bool_not(vals[args[0]])
            else:
                raise NotImplementedError(op)
        outs = []
        for o in dt.outputs:
            v = vals[o]
            if isinstance(v, np.ndarray) or v.shape[-1] != batch:
                v = jnp.broadcast_to(v, (self.jf.L, batch))
            outs.append(v)
        return jnp.stack(outs)

    def _run(self, inputs):
        """inputs: uint32 (n_inputs, L, batch) -> (n_witness, L, batch)."""
        if self.fused is not None and (
                self._mode in ("segments", "interp")
                or on_tpu()):
            return self.fused._run(inputs)
        if self.unroll:
            return self._run_ssa(inputs)
        self._ensure_scan_tables()
        rf = self._init_regfile(inputs)
        opc, a_i, b_i, c_i, o_i, w_i, imm = self.tables
        branches = [self._branch(op) for op in self.branch_ops]
        # witness stream buffer (+1 trash row); step results land directly
        # here, so the register file only holds live dataflow values.
        batch, L = inputs.shape[2], self.jf.L
        out = jnp.zeros((self.n_witness + 1, L, batch), jnp.uint32)
        for (reg, positions) in self.load_outputs:
            for d in positions:
                out = out.at[d].set(rf[reg])
        tables = tuple(jnp.asarray(t) for t in self.tables)
        S = self.slots

        def body(carry, instr):
            rfc, outc = carry
            op, ai, bi, ci, oi, wi, k = instr

            def pick(idx):
                return jnp.stack([
                    lax.dynamic_index_in_dim(rfc, idx[j], 0, keepdims=False)
                    for j in range(S)
                ])

            # scalar-index dynamic slices/updates: XLA keeps both buffers
            # in place inside the loop (a vector gather/scatter would
            # force a full copy per step — HBM-bandwidth death).
            fa, fb, fc = pick(ai), pick(bi), pick(ci)
            res = lax.switch(op, branches, fa, fb, fc,
                             k.astype(jnp.uint32))
            for j in range(S):
                rfc = lax.dynamic_update_index_in_dim(rfc, res[j], oi[j], 0)
                outc = lax.dynamic_update_index_in_dim(outc, res[j], wi[j], 0)
            return (rfc, outc), None

        (rf, out), _ = lax.scan(body, (rf, out), tables)
        for (src_pos, dst_pos) in self.out_dups:
            out = out.at[dst_pos].set(out[src_pos])
        return out[:self.n_witness]

    def run(self, inputs):
        """inputs: uint32 array (n_inputs, L, batch)."""
        if self._jit is None:
            self._jit = jax.jit(self._run)
        return self._jit(inputs)

    def jittable(self):
        return self._run

    def run_mixed(self, inputs):
        """Witness in MIXED representation: (narrow int32 (n_nw, B),
        wide uint32 (n_wd, L, B)); row->witness-index maps from
        mixed_layout().  Bit-class witness values stay one int32 each
        (a SHA256 witness at batch 64k would be >100GB in limb form).
        Only the in-kernel interpreter backend produces a narrow part;
        other paths return everything wide."""
        from .interp import InterpreterProgram

        if isinstance(self.fused, InterpreterProgram) and (
                self._mode in ("segments", "interp") or on_tpu()):
            return self.fused.run_mixed(inputs)
        wide = self.run(inputs)
        return (jnp.zeros((0, wide.shape[2]), jnp.int32), wide)

    def mixed_layout(self):
        from .interp import InterpreterProgram

        if isinstance(self.fused, InterpreterProgram):
            return self.fused.mixed_layout()
        return ([], list(range(self.n_witness)))

    # -- host-side convenience ------------------------------------------
    def encode_inputs(self, columns):
        """columns: list (len n_inputs) of lists of ints (len batch)
        -> uint32 (n_inputs, L, batch)."""
        from ..ops.limbs import ints_to_limbs

        L = self.jf.L
        arrs = [ints_to_limbs(col, L).T.copy() for col in columns]
        return np.stack(arrs, axis=0)

    def decode_outputs(self, arr):
        """(n_outputs, L, batch) -> list of lists of ints [output][batch]."""
        from ..ops.limbs import limbs_to_int

        arr = np.asarray(arr)
        return [
            [limbs_to_int(arr[i, :, j]) for j in range(arr.shape[2])]
            for i in range(arr.shape[0])
        ]
