"""In-kernel interpreter: the production TPU path for large tapes.

This is the TPU-native analog of the reference's emitted WASM witness
calculator (code_producers/src/wasm_elements/witness_calculator.js +
generated $runs table): instead of emitting code per circuit, ONE
Pallas kernel interprets static instruction tables — so Mosaic compile
time is O(#opcodes), independent of circuit size, while the whole
batched witness computation still runs on-chip:

* instruction tables (opcode, operand regs, dest reg, emission row)
  are scalar-prefetched into SMEM;
* the register file is a VMEM scratch of uint32[n_regs, L, 8, 128]
  limb tiles that PERSISTS across the inner grid dimension;
* constants live compacted in SMEM (n_bank, L) and are multiplied in
  as scalar immediates (`mul_c`); Montgomery conversions get static
  opcodes (`mul_one`, `mul_r2`) whose zero limbs are skipped;
* a `lax.fori_loop` steps through the tape with a `lax.switch`
  restricted to the opcodes present;
* witness values stream out through a chunked emission buffer: grid =
  (batch_blocks, chunks); chunk c executes steps starts[c]..starts[c+1]
  and owns an output block of up to `chunk_emits` rows, which Pallas
  pipelines back to HBM while the next chunk computes.  A final gather
  permutes emission rows into witness order.

Dispatch per run: ONE pallas_call (vs one per field op in the naive
path, whose ~270 us/op dispatch+DMA floor measured 128k wit/s on
Poseidon2 at batch 64k).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.primes import LIMB_BITS, FieldSpec
from ..ops.limbs import int_to_limbs
from ..ops.limb_emit import MASK, LimbEmitter
from ..ops.jfield import on_tpu
from .plan import ExpandedTape, UnsupportedTapeOp

# ops the interpreter kernel supports (shifts need static immediates —
# those tapes run on the segmented/scan paths instead)
_VV_OPS = {
    "mul", "add", "sub", "select",
    "eq", "neq", "lt", "le", "gt", "ge",
    "land", "lor", "lnot",
    "band", "bor", "bxor", "bnot",
}
# ops with a constant operand that get a const-bank variant
_C_VARIANTS = {"mul": "mul_c", "add": "add_c", "sub": "sub_c"}


class InterpreterProgram:
    """Executable interpreter form of a DomainTape for one field."""

    def __init__(self, dtape, spec: FieldSpec, *, lanes=None,
                 chunk_emits=32, interpret=None, max_regs=112):
        self.spec = spec
        self.em = LimbEmitter(spec)
        self.L = spec.n_limbs
        self.K = chunk_emits
        self.interpret = interpret
        self.n_inputs = dtape.n_inputs
        self.xt = ExpandedTape(dtape, spec)
        self._plan(max_regs)
        self.n_witness = len(self.xt.out_ids)
        if lanes is None:
            # widest batch block that keeps the register file + double-
            # buffered in/out blocks inside ~12MB of the 16MB VMEM
            # (256 lanes measured ~4% faster than 128 on Poseidon2)
            rows = (self.n_regs + 2 * (self.K + 2)
                    + 2 * max(self.n_inputs, 1))
            lanes = 256 if rows * self.L * 8 * 256 * 4 <= 12 << 20 else 128
        self.lanes = lanes
        self._jit = None

    # ------------------------------------------------------------------
    def _plan(self, max_regs):
        xt = self.xt
        L = self.L
        one_v = 1
        r2_v = (xt.R * xt.R) % xt.p

        comp = [i for i in range(len(xt.ops))
                if xt.kind[i] == "compute" and xt.live[i]]
        comp = self._reorder(comp, r2_v)
        out_set = set(xt.out_ids)

        # --- operand normalization ------------------------------------
        bank_vals = []          # const-bank rows (values)
        bank_dedup = {}
        mat_ix = {}             # const value -> materialized reg (later)
        steps = []              # (op, a_node, b_src, c_node, node, aux)

        def bank(v):
            hit = bank_dedup.get(v)
            if hit is None:
                hit = bank_dedup[v] = len(bank_vals)
                bank_vals.append(v)
            return hit

        def bank_range(vals):
            """Consecutive bank rows (dot coefficient blocks)."""
            base = len(bank_vals)
            bank_vals.extend(vals)
            return base

        def materialize(v):
            hit = mat_ix.get(v)
            if hit is None:
                hit = mat_ix[v] = len(mat_ix)
            return hit

        alias = {}

        def res(a):
            while a in alias:
                a = alias[a]
            return a

        def synth():
            nid = len(xt.ops)
            xt.ops.append("_tmp")
            xt.args.append(())
            xt.imms.append(None)
            xt.kind.append("compute")
            xt.cval.append(None)
            xt.iidx.append(None)
            xt.live.append(True)
            return nid

        # --- lincomb fusion pre-pass ------------------------------------
        # MDS-style rows arrive as add(add(add(K, mul_c), mul_c), mul_c):
        # fuse single-use mul_c terms under single-use adds into dot ops
        # that accumulate every convolution into ONE column set and
        # Montgomery-reduce once (lazy reduction; ~30% off MDS cost).
        uses = {}
        for i in comp:
            for x in xt.args[i]:
                if xt.kind[x] == "compute":
                    uses[x] = uses.get(x, 0) + 1
        for o in xt.out_ids:
            uses[o] = uses.get(o, 0) + 1

        def mulc_leaf(x):
            if xt.ops[x] != "mul" or uses.get(x, 0) != 1 or x in out_set:
                return None
            a0, a1 = xt.args[x]
            if xt.kind[a0] == "const" and xt.kind[a1] != "const":
                return (a1, xt.cval[a0])
            if xt.kind[a1] == "const" and xt.kind[a0] != "const":
                return (a0, xt.cval[a1])
            return None

        roots, absorbed = {}, set()
        for i in reversed(comp):
            if xt.ops[i] != "add" or i in absorbed:
                continue
            terms, bares, K_acc, local = [], [], 0, []
            stack = list(xt.args[i])
            while stack:
                x = stack.pop()
                if xt.kind[x] == "const":
                    K_acc = (K_acc + xt.cval[x]) % xt.p
                    continue
                if xt.kind[x] == "input":
                    bares.append(x)
                    continue
                t = mulc_leaf(x)
                if t is not None:
                    terms.append(t)
                    local.append(x)
                    continue
                if (xt.ops[x] == "add" and uses.get(x, 0) == 1
                        and x not in out_set and x not in absorbed):
                    local.append(x)
                    stack.extend(xt.args[x])
                    continue
                bares.append(x)
            if len(terms) >= 2:
                roots[i] = (terms, bares, K_acc)
                absorbed.update(local)

        for i in comp:
            if i in absorbed:
                continue
            if i in roots:
                terms, bares, K_acc = roots[i]
                parts = []
                g = 0
                first = True
                while len(terms) - g >= 2:
                    n = 3 if len(terms) - g >= 3 else 2
                    grp = terms[g:g + n]
                    g += n
                    # the additive constant folds into the first dot's
                    # column set pre-Montgomery-scaled: sum(c*x)R^-1 + K
                    # = (sum(c*x) + K*R)R^-1
                    kfold = (K_acc * xt.R) % xt.p if first else 0
                    first = False
                    base = bank_range([c for (_x, c) in grp] + [kfold])
                    nid = synth()
                    steps.append((
                        f"dot{n}_c",
                        res(grp[0][0]), res(grp[1][0]),
                        res(grp[2][0]) if n == 3 else None,
                        nid, base))
                    parts.append(nid)
                if len(terms) - g == 1:
                    x, c = terms[g]
                    nid = synth()
                    steps.append(("mul_c", res(x), ("bank", bank(c)),
                                  None, nid, None))
                    parts.append(nid)
                parts.extend(res(x) for x in bares)
                acc = parts[0]
                for x in parts[1:]:
                    nid = synth()
                    steps.append(("add", acc, x, None, nid, None))
                    acc = nid
                if K_acc and first:  # no dot absorbed it (unreachable:
                    nid = synth()    # >=2 terms always makes a dot)
                    steps.append(("add_c", acc, ("bank", bank(K_acc)),
                                  None, nid, None))
                    acc = nid
                alias[i] = acc
                continue
            op = xt.ops[i]
            a = [res(x) for x in xt.args[i]]
            kinds = [xt.kind[x] for x in a]
            if op == "select" and kinds[0] == "const":
                alias[i] = a[1] if xt.cval[a[0]] else a[2]
                continue
            if op in _C_VARIANTS:
                ops_c = _C_VARIANTS[op]
                if op in ("mul", "add") and kinds[0] == "const":
                    a = [a[1], a[0]]
                    kinds = [kinds[1], kinds[0]]
                if kinds[1] == "const":
                    v = xt.cval[a[1]]
                    if op == "mul" and v == one_v:
                        steps.append(("mul_one", a[0], None, None, i, None))
                    elif op == "mul" and v == r2_v:
                        steps.append(("mul_r2", a[0], None, None, i, None))
                    else:
                        steps.append((ops_c, a[0], ("bank", bank(v)),
                                      None, i, None))
                    continue
                if op == "sub" and kinds[0] == "const":
                    steps.append(("csub_c", a[1], ("bank",
                                                   bank(xt.cval[a[0]])),
                                  None, i, None))
                    continue
                steps.append((op, a[0], a[1], None, i, None))
                continue
            if op not in _VV_OPS:
                raise UnsupportedTapeOp(
                    f"op '{op}' not supported by the interpreter kernel")
            # materialize const operands of the remaining ops
            norm = []
            for x, k in zip(a, kinds):
                if k == "const":
                    norm.append(("mat", materialize(xt.cval[x])))
                else:
                    norm.append(x)
            pad = norm + [None] * (3 - len(norm))
            steps.append((op, pad[0], pad[1], pad[2], i, None))

        # resolve witness ids through aliases
        self.xt.out_ids = [res(o) for o in self.xt.out_ids]
        out_set = set(self.xt.out_ids)

        # --- register allocation ---------------------------------------
        # regs: [inputs][materialized consts][dynamic...][trash]
        n_fixed = self.n_inputs + len(mat_ix)
        self.mat_loads = [
            (self.n_inputs + r, tuple(int(x) for x in int_to_limbs(v, L)))
            for v, r in sorted(mat_ix.items(), key=lambda kv: kv[1])
        ]
        last_use = {}
        for t, (_op, a, b, c, _i, _aux) in enumerate(steps):
            for x in (a, b, c):
                if isinstance(x, int):
                    last_use[x] = t
        reg_of = {}
        free = []
        n_dyn = 0
        expire = [[] for _ in range(len(steps) + 1)]
        emitted = {}

        def reg_for_operand(x):
            if xt.kind[x] == "input":
                return xt.iidx[x]
            return reg_of[x]

        table = np.zeros((max(len(steps), 1), 7), np.int32)
        self.opset = sorted({op for (op, *_rest) in steps})
        op_id = {op: k for k, op in enumerate(self.opset)}

        # chunking by emission count
        K = self.K
        starts = [0]
        emit_count = 0
        chunk = 0
        wit_rows = {}  # node -> (chunk, row)
        for t, (op, a, b, c, i, aux) in enumerate(steps):
            for r in expire[t]:
                free.append(r)
            emits = i in out_set
            if emits and emit_count == K:
                starts.append(t)
                chunk += 1
                emit_count = 0
            # operands
            ta = reg_for_operand(a) if isinstance(a, int) else (
                self.n_inputs + a[1] if isinstance(a, tuple)
                and a[0] == "mat" else 0)
            if isinstance(b, int):
                tb = reg_for_operand(b)
            elif isinstance(b, tuple):
                tb = (b[1] if b[0] == "bank"
                      else self.n_inputs + b[1])
            else:
                tb = 0
            if isinstance(c, int):
                tc = reg_for_operand(c)
            elif isinstance(c, tuple):
                tc = self.n_inputs + c[1]
            else:
                tc = 0
            # destination
            if i in last_use and last_use[i] > t:
                r = free.pop() if free else n_fixed + n_dyn
                if r == n_fixed + n_dyn:
                    n_dyn += 1
                reg_of[i] = r
                expire[last_use[i] + 1].append(r)
                dst = r
            else:
                dst = -1  # trash, patched below
            if emits:
                wit_rows[i] = (chunk, emit_count)
                em = emit_count
                emit_count += 1
            else:
                em = K
            table[t] = (op_id[op], ta, tb, tc, dst, em,
                        aux if aux is not None else 0)
        starts.append(len(steps))
        self.n_regs = n_fixed + n_dyn + 1  # + trash
        if self.n_regs > max_regs:
            raise UnsupportedTapeOp(
                f"register file too large ({self.n_regs} > {max_regs})")
        trash = self.n_regs - 1
        for t in range(len(steps)):
            if table[t, 4] == -1:
                table[t, 4] = trash
        self.table = table
        self.starts = np.asarray(starts, np.int32)
        self.n_chunks = len(starts) - 1
        self.n_steps = len(steps)
        # const bank (scalar-prefetched, int32)
        if not bank_vals:
            bank_vals.append(0)
        cb = np.zeros((len(bank_vals), L), np.int32)
        for r, v in enumerate(bank_vals):
            cb[r] = int_to_limbs(v, L).astype(np.int32)
        self.cbank = cb
        # witness source map
        self.wit_src = []
        for nid in self.xt.out_ids:
            k = xt.kind[nid]
            if k == "const":
                self.wit_src.append(("const", xt.cval[nid]))
            elif k == "input":
                self.wit_src.append(("input", xt.iidx[nid]))
            else:
                self.wit_src.append(("emit", *wit_rows[nid]))

    # ------------------------------------------------------------------
    def _reorder(self, comp, r2_v):
        """Hoist Montgomery-conversion muls (by 1 or R^2) to right after
        their producer.  DomainTape materializes output conversions at
        the tape tail, which otherwise keeps every Montgomery witness
        value live to the end (measured 320 registers on Poseidon2 vs
        ~30 after hoisting)."""
        xt = self.xt
        comp_set = set(comp)
        attach, head = {}, []
        conv = set()
        for i in comp:
            if xt.ops[i] != "mul":
                continue
            var = [x for x in xt.args[i] if xt.kind[x] != "const"]
            cst = [x for x in xt.args[i] if xt.kind[x] == "const"]
            if len(var) == 1 and cst and xt.cval[cst[0]] in (1, r2_v):
                conv.add(i)
                if var[0] in comp_set:
                    attach.setdefault(var[0], []).append(i)
                else:
                    head.append(i)
        order = []

        def place(i):
            order.append(i)
            for c in attach.get(i, ()):
                place(c)

        for i in head:
            place(i)
        for i in comp:
            if i not in conv:
                place(i)
        return order

    # ------------------------------------------------------------------
    def _make_kernel(self, bb):
        L = self.L
        em = self.em
        K = self.K
        n_inputs = self.n_inputs
        mat_loads = self.mat_loads
        opset = self.opset

        def kernel(starts_ref, opc_ref, ia_ref, ib_ref, ic_ref, dst_ref,
                   em_ref, aux_ref, cb_ref, in_ref, out_ref, rf):
            c = pl.program_id(1)
            zero = jnp.zeros((8, bb), jnp.uint32)

            @pl.when(c == 0)
            def _():
                for k in range(n_inputs):
                    for i in range(L):
                        rf[k, i] = in_ref[k, i]
                for (reg, limbs) in mat_loads:
                    for i in range(L):
                        rf[reg, i] = jnp.full((8, bb), np.uint32(limbs[i]),
                                              jnp.uint32)

            def step(t, carry):
                ia = ia_ref[t]
                ib = ib_ref[t]
                ic = ic_ref[t]
                aux = aux_ref[t]

                def rd_vv(k, i):
                    idx = (ia, ib, ic)[k]
                    return rf[idx, i]

                def rd_bank(k, i):
                    if k == 1:
                        return lax.convert_element_type(
                            cb_ref[ib * L + i], jnp.uint32)
                    return rf[ia, i]

                def rd_static(limbs):
                    def rd(k, i):
                        if k == 1:
                            return np.uint32(limbs[i])
                        return rf[ia, i]
                    return rd

                one_l = [0] * L
                one_l[0] = 1
                r2_l = [int(x) for x in
                        int_to_limbs((self.xt.R * self.xt.R) % self.xt.p,
                                     L)]

                def dot(nterms):
                    # lazy reduction: accumulate every term's
                    # convolution into one column set, reduce once;
                    # bank rows aux..aux+nterms hold [coeffs..., K*R]
                    cols = [zero] * (2 * L + 1)
                    for t_i in range(nterms):
                        xreg = (ia, ib, ic)[t_i]
                        cs = [lax.convert_element_type(
                            cb_ref[(aux + t_i) * L + j], jnp.uint32)
                            for j in range(L)]
                        for i in range(L):
                            xi = rf[xreg, i]
                            for j in range(L):
                                prod = xi * cs[j]
                                cols[i + j] = cols[i + j] + (prod & MASK)
                                cols[i + j + 1] = (cols[i + j + 1]
                                                   + (prod >> LIMB_BITS))
                    for j in range(L):
                        cols[j] = cols[j] + lax.convert_element_type(
                            cb_ref[(aux + nterms) * L + j], jnp.uint32)
                    return em.mont_reduce_rows(cols, zero)

                def branch(op):
                    if op == "dot2_c":
                        rows = dot(2)
                    elif op == "dot3_c":
                        rows = dot(3)
                    elif op == "mul_one":
                        rows = em.emit_mul(rd_static(one_l), zero)
                    elif op == "mul_r2":
                        rows = em.emit_mul(rd_static(r2_l), zero)
                    elif op == "mul_c":
                        rows = em.emit_mul(rd_bank, zero)
                    elif op == "add_c":
                        rows = em.emit("add", rd_bank, None, zero)
                    elif op == "sub_c":
                        rows = em.emit("sub", rd_bank, None, zero)
                    elif op == "csub_c":
                        # bank - rf: swap operand order
                        def rd(k, i):
                            if k == 0:
                                return lax.convert_element_type(
                                    cb_ref[ib * L + i], jnp.uint32)
                            return rf[ia, i]
                        rows = em.emit("sub", rd, None, zero)
                    else:
                        rows = em.emit(op, rd_vv, None, zero)
                    return jnp.stack(
                        [jnp.broadcast_to(r, (8, bb)) for r in rows])

                res = lax.switch(opc_ref[t],
                                 [lambda op=op: branch(op) for op in opset])
                rf[dst_ref[t]] = res
                out_ref[0, em_ref[t]] = res
                return carry

            lax.fori_loop(starts_ref[c], starts_ref[c + 1], step, 0)

        return kernel

    # ------------------------------------------------------------------
    def _run(self, inputs):
        """uint32 (n_inputs, L, B) -> (n_witness, L, B)."""
        L = self.L
        xt = self.xt
        n_in_prog = max(self.n_inputs, 1)
        _n, _L, B = inputs.shape
        bb = self.lanes
        unit = 8 * bb if B >= 8 * bb else 8
        Bp = -(-B // unit) * unit
        if Bp != B:
            inputs = jnp.pad(inputs, ((0, 0), (0, 0), (0, Bp - B)))
        B8 = Bp // 8
        bb = min(bb, B8)
        x = inputs.reshape(n_in_prog, L, 8, B8) if self.n_inputs \
            else jnp.zeros((1, L, 8, B8), jnp.uint32)
        K = self.K

        if self.n_steps:
            interp = (not on_tpu()) \
                if self.interpret is None else self.interpret
            grid_spec = pltpu.PrefetchScalarGridSpec(
                # 1D tables only: SMEM pads the minor dim to 128 lanes,
                # so a (n,6) table costs 512B/row (measured OOM at 1879
                # steps); six 1D arrays cost 4B/step.
                num_scalar_prefetch=9,
                grid=(pl.cdiv(B8, bb), self.n_chunks),
                in_specs=[pl.BlockSpec((n_in_prog, L, 8, bb),
                                       lambda g, c, *_: (0, 0, 0, g),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, K + 1, L, 8, bb),
                                       lambda g, c, *_: (c, 0, 0, 0, g),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((self.n_regs, L, 8, bb), jnp.uint32)],
            )
            t = self.table
            emits = pl.pallas_call(
                self._make_kernel(bb),
                out_shape=jax.ShapeDtypeStruct(
                    (self.n_chunks, K + 1, L, 8, B8), jnp.uint32),
                grid_spec=grid_spec,
                interpret=interp,
            )(self.starts, np.ascontiguousarray(t[:, 0]),
              np.ascontiguousarray(t[:, 1]), np.ascontiguousarray(t[:, 2]),
              np.ascontiguousarray(t[:, 3]), np.ascontiguousarray(t[:, 4]),
              np.ascontiguousarray(t[:, 5]), np.ascontiguousarray(t[:, 6]),
              self.cbank.reshape(-1), x)
            flat = emits.reshape(self.n_chunks * (K + 1), L, 8, B8)
        else:
            flat = jnp.zeros((1, L, 8, B8), jnp.uint32)

        # gather emissions/inputs/consts into witness order
        const_rows = []
        const_pos = {}
        idx = []
        n_flat = flat.shape[0]
        for src in self.wit_src:
            if src[0] == "emit":
                idx.append(src[1] * (K + 1) + src[2])
            elif src[0] == "input":
                idx.append(n_flat + src[1])
            else:
                v = src[1]
                if v not in const_pos:
                    const_pos[v] = len(const_rows)
                    const_rows.append(np.asarray(int_to_limbs(v, L)))
                idx.append(n_flat + n_in_prog + const_pos[v])
        banks = [flat, x]
        if const_rows:
            cb = jnp.broadcast_to(
                jnp.asarray(np.stack(const_rows))[:, :, None, None],
                (len(const_rows), L, 8, B8))
            banks.append(cb)
        big = jnp.concatenate(banks, axis=0)
        wit = jnp.take(big, jnp.asarray(idx, np.int32), axis=0)
        return wit.reshape(len(idx), L, Bp)[..., :B]

    def run(self, inputs):
        if self._jit is None:
            self._jit = jax.jit(self._run)
        return self._jit(inputs)

    def stats(self):
        from collections import Counter
        return {
            "steps": self.n_steps,
            "chunks": self.n_chunks,
            "regs": self.n_regs,
            "bank": int(self.cbank.shape[0]),
            "ops": dict(Counter(
                self.opset[k] for k in self.table[:, 0])),
        }
