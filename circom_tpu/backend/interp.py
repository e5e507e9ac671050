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
from .plan import ExpandedTape, UnsupportedTapeOp, expanded_ranges

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

# comparison/boolean ops: always narrow results; _nn reads the narrow
# register file, _ww the wide one (mixed operands widen first)
_CMP = {"eq", "neq", "lt", "le", "gt", "ge", "land", "lor"}

# opcodes whose result lives in the narrow int32 register file
_NARROW_RESULT = (
    {"nmul", "nadd", "nsub", "nsel", "nsel_w", "nband", "nbor", "nbxor",
     "nshl", "nshr", "nband_w", "lnot_n", "lnot_w"}
    | {f"{o}_nn" for o in _CMP} | {f"{o}_ww" for o in _CMP}
)

# operand register files per opcode position ('n' narrow / 'w' wide);
# default is all-wide
_OPERAND_FILES = {
    "nmul": ("n", "n", "w"), "nadd": ("n", "n", "w"),
    "nsub": ("n", "n", "w"), "nband": ("n", "n", "w"),
    "nbor": ("n", "n", "w"), "nbxor": ("n", "n", "w"),
    "nsel": ("n", "n", "n"), "nsel_w": ("w", "n", "n"),
    "nshl": ("n", "w", "w"), "nshr": ("n", "w", "w"),
    "nband_w": ("w", "w", "w"), "widen": ("n", "w", "w"),
    "lnot_n": ("n", "w", "w"), "lnot_w": ("w", "w", "w"),
}
for _o in _CMP:
    _OPERAND_FILES[f"{_o}_nn"] = ("n", "n", "w")
    _OPERAND_FILES[f"{_o}_ww"] = ("w", "w", "w")


class InterpreterProgram:
    """Executable interpreter form of a DomainTape for one field."""

    def __init__(self, dtape, spec: FieldSpec, *, lanes=None,
                 chunk_emits=32, interpret=None, max_regs=2048,
                 input_ranges=None, max_call_steps=24_000):
        # max_regs is a sanity backstop; actual capacity is enforced by
        # the VMEM-aware lane selection below (narrow batch blocks for
        # register-heavy circuits).
        self.spec = spec
        self.em = LimbEmitter(spec)
        self.L = spec.n_limbs
        self.K = chunk_emits
        self.interpret = interpret
        self.input_ranges = input_ranges or {}
        self.max_call_steps = max_call_steps
        self.n_inputs = dtape.n_inputs
        self.xt = ExpandedTape(dtape, spec)
        self._plan(max_regs)
        self.n_witness = len(self.xt.out_ids)
        if lanes is None:
            # widest batch block that keeps the register files + double-
            # buffered in/out blocks inside ~13MB of the 16MB VMEM
            # (256 lanes measured ~4% faster than 128 on Poseidon2)
            tiles = (self.n_regs * self.L + self.n_nregs
                     + 2 * (self.K + 2) * self.L
                     + 2 * max(self.n_win, 1) * self.L
                     + max(self.n_nin, 1))
            lanes = 8
            for cand in (256, 128, 64, 32, 16, 8):
                if tiles * 8 * cand * 4 <= 13 << 20:
                    lanes = cand
                    break
            if tiles * 8 * 8 * 4 > 13 << 20:
                raise UnsupportedTapeOp(
                    f"register files exceed VMEM ({tiles} tiles)")
        self.lanes = lanes
        self._jit = None

    # ------------------------------------------------------------------
    def _plan(self, max_regs):
        xt = self.xt
        L = self.L
        one_v = 1
        r2_v = (xt.R * xt.R) % xt.p
        half = xt.p >> 1

        comp = [i for i in range(len(xt.ops))
                if xt.kind[i] == "compute" and xt.live[i]]
        comp = self._reorder(comp, r2_v)
        out_set = set(xt.out_ids)

        # --- operand normalization ------------------------------------
        bank_vals = []          # const-bank rows (values)
        bank_dedup = {}
        mat_ix = {}             # const value -> wide materialized slot
        nmat_ix = {}            # signed int32 const -> narrow slot
        steps = []              # (op, a, b, c, node, aux)

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

        def signed_of(v):
            return v if v <= half else v - xt.p

        def nfits(v):
            return abs(signed_of(v)) <= (1 << 31) - 1

        def nmaterialize(v):
            sv = signed_of(v)
            hit = nmat_ix.get(sv)
            if hit is None:
                hit = nmat_ix[sv] = len(nmat_ix)
            return hit

        alias = {}

        def res(a):
            while a in alias:
                a = alias[a]
            return a

        # inputs with int32-provable range hints (signal tags) live in
        # the narrow register file; the rest in the wide one
        NM31 = (1 << 31) - 1
        self.nin_of = {}
        self.win_of = {}
        for idx in range(self.n_inputs):
            h = self.input_ranges.get(idx)
            if h is not None and 0 <= h[0] and h[1] <= NM31:
                self.nin_of[idx] = len(self.nin_of)
            else:
                self.win_of[idx] = len(self.win_of)

        node_narrow = {}
        for i0 in range(len(xt.ops)):
            if xt.kind[i0] == "compute":
                node_narrow[i0] = bool(xt.narrow[i0])
            elif xt.kind[i0] == "input":
                node_narrow[i0] = xt.iidx[i0] in self.nin_of

        def is_nrw(x):
            return node_narrow.get(x, False)

        def synth(narrow=False):
            nid = len(xt.ops)
            xt.ops.append("_tmp")
            xt.args.append(())
            xt.imms.append(None)
            xt.kind.append("compute")
            xt.cval.append(None)
            xt.iidx.append(None)
            xt.narrow.append(narrow)
            xt.live.append(True)
            node_narrow[nid] = narrow
            return nid

        widened = {}

        def _emit_widen_if_out(x):
            """Emission needs full limbs: widen a narrow witness value
            right after its defining step (NOT at the tape end, which
            would keep every narrow witness value live to the end —
            measured 25k registers on SHA256)."""
            if is_nrw(x) and x in out_set:
                wide_of(x)

        def wide_of(x):
            """Wide (L-limb) view of a narrow node: emits one `widen`
            step per node, cached."""
            w = widened.get(x)
            if w is None:
                w = synth(False)
                widened[x] = w
                steps.append(("widen", x, None, None, w, None))
            return w

        def wform(x):
            """Operand in wide form (const -> wide materialized reg)."""
            if xt.kind[x] == "const":
                return ("mat", materialize(xt.cval[x]))
            if is_nrw(x):
                return wide_of(x)
            return x

        def nform(x):
            """Operand in narrow form (const -> narrow slot)."""
            if xt.kind[x] == "const":
                return ("nmat", nmaterialize(xt.cval[x]))
            return x

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
            if xt.kind[a0] == "const" and xt.kind[a1] != "const" \
                    and not is_nrw(a1):
                return (a1, xt.cval[a0])
            if xt.kind[a1] == "const" and xt.kind[a0] != "const" \
                    and not is_nrw(a0):
                return (a0, xt.cval[a1])
            return None

        roots, absorbed = {}, set()
        for i in reversed(comp):
            if xt.ops[i] != "add" or i in absorbed or is_nrw(i):
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
                        and not is_nrw(x)
                        and x not in out_set and x not in absorbed):
                    local.append(x)
                    stack.extend(xt.args[x])
                    continue
                bares.append(x)
            if len(terms) >= 2:
                roots[i] = (terms, bares, K_acc)
                absorbed.update(local)

        # --- narrow-sum reassociation pre-pass ---------------------------
        # Bit-lincomb adders (sum of bit*2^k, SHA AddModW) arrive as long
        # WIDE add chains because the source-order partial sums overflow
        # int32 after ~31 terms.  Field addition is associative:
        # regroup narrow leaves into int32-safe partial sums (nadd
        # chains), widen each group once, and wide-add the few groups.
        rngx = expanded_ranges(xt, self.input_ranges)
        NM = (1 << 31) - 1
        nroots = {}
        for i in reversed(comp):
            if xt.ops[i] != "add" or is_nrw(i) or i in absorbed \
                    or i in roots:
                continue
            leaves_n, leaves_w, K2, local = [], [], 0, []
            stack = list(xt.args[i])
            while stack:
                x = stack.pop()
                if xt.kind[x] == "const":
                    K2 = (K2 + xt.cval[x]) % xt.p
                    continue
                if (xt.kind[x] == "compute" and xt.ops[x] == "add"
                        and not is_nrw(x) and uses.get(x, 0) == 1
                        and x not in out_set and x not in absorbed
                        and x not in roots):
                    local.append(x)
                    stack.extend(xt.args[x])
                    continue
                if is_nrw(x) and rngx[x] is not None:
                    leaves_n.append(x)
                else:
                    leaves_w.append(x)
            if len(leaves_n) >= 4:
                nroots[i] = (leaves_n, leaves_w, K2)
                absorbed.update(local)

        for i in comp:
            if i in absorbed:
                continue
            if i in nroots:
                leaves_n, leaves_w, K2 = nroots[i]
                groups = []
                cur, lo, hi = [], 0, 0
                for x in leaves_n:
                    xlo, xhi = rngx[x]
                    if cur and not (-NM <= lo + xlo and hi + xhi <= NM):
                        groups.append(cur)
                        cur, lo, hi = [], 0, 0
                    cur.append(x)
                    lo += xlo
                    hi += xhi
                if cur:
                    groups.append(cur)
                wparts = [wform(res(x)) for x in leaves_w]
                for grp in groups:
                    acc_n = grp[0]
                    for x in grp[1:]:
                        nid = synth(True)
                        steps.append(("nadd", nform(res(acc_n)),
                                      nform(res(x)), None, nid, None))
                        acc_n = nid
                    wparts.append(wide_of(res(acc_n)))
                acc = wparts[0]
                for xw in wparts[1:]:
                    nid = synth()
                    steps.append(("add", acc, xw, None, nid, None))
                    acc = nid
                if K2:
                    nid = synth()
                    steps.append(("add_c", acc, ("bank", bank(K2)),
                                  None, nid, None))
                    acc = nid
                alias[i] = acc
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
                    x, cv = terms[g]
                    nid = synth()
                    steps.append(("mul_c", res(x), ("bank", bank(cv)),
                                  None, nid, None))
                    parts.append(nid)
                parts.extend(wform(res(x)) if isinstance(res(x), int)
                             else res(x) for x in bares)
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
            nrw_i = is_nrw(i)

            # ---- narrow-result ops (comparisons/booleans always) -----
            if op in _CMP:
                xs = [x for x, k in zip(a, kinds) if k != "const"]
                if xs and all(is_nrw(x) for x in xs) and all(
                        nfits(xt.cval[x]) for x, k in zip(a, kinds)
                        if k == "const"):
                    steps.append((op + "_nn", nform(a[0]), nform(a[1]),
                                  None, i, None))
                else:
                    steps.append((op + "_ww", wform(a[0]), wform(a[1]),
                                  None, i, None))
                node_narrow[i] = True
                _emit_widen_if_out(i)
                continue
            if op == "lnot":
                if is_nrw(a[0]):
                    steps.append(("lnot_n", a[0], None, None, i, None))
                else:
                    steps.append(("lnot_w", wform(a[0]), None, None,
                                  i, None))
                node_narrow[i] = True
                _emit_widen_if_out(i)
                continue
            if nrw_i and op in ("mulp", "add", "sub"):
                nop = {"mulp": "nmul", "add": "nadd", "sub": "nsub"}[op]
                steps.append((nop, nform(a[0]), nform(a[1]), None,
                              i, None))
                _emit_widen_if_out(i)
                continue
            if nrw_i and op == "select":
                x1, x2 = nform(a[1]), nform(a[2])
                if kinds[0] != "const" and not is_nrw(a[0]):
                    steps.append(("nsel_w", a[0], x1, x2, i, None))
                else:
                    steps.append(("nsel", nform(a[0]), x1, x2, i, None))
                _emit_widen_if_out(i)
                continue
            if nrw_i and op == "band":
                cargs = [x for x, k in zip(a, kinds) if k == "const"]
                vargs = [x for x, k in zip(a, kinds) if k != "const"]
                if len(vargs) == 2 and all(is_nrw(x) for x in vargs):
                    steps.append(("nband", vargs[0], vargs[1], None,
                                  i, None))
                    _emit_widen_if_out(i)
                    continue
                if len(vargs) == 1 and is_nrw(vargs[0]) and cargs:
                    steps.append(("nband", vargs[0], nform(cargs[0]),
                                  None, i, None))
                    _emit_widen_if_out(i)
                    continue
                if len(vargs) == 1 and cargs \
                        and xt.cval[cargs[0]] <= (1 << 31) - 1:
                    # wide value masked by a small constant -> narrow
                    steps.append(("nband_w", wform(vargs[0]), None, None,
                                  i, bank(xt.cval[cargs[0]])))
                    _emit_widen_if_out(i)
                    continue
                node_narrow[i] = False
                nrw_i = False  # fall through to the wide band
            if nrw_i and op in ("bor", "bxor"):
                steps.append(({"bor": "nbor", "bxor": "nbxor"}[op],
                              nform(a[0]), nform(a[1]), None, i, None))
                _emit_widen_if_out(i)
                continue
            if nrw_i and op in ("shl_k", "shr_k"):
                steps.append(({"shl_k": "nshl", "shr_k": "nshr"}[op],
                              nform(a[0]), None, None, i, xt.imms[i]))
                _emit_widen_if_out(i)
                continue

            # ---- wide ops ---------------------------------------------
            if op == "mulp":
                # plain product on the wide lane; by a constant it is a
                # single montmul with the constant pre-scaled by R:
                # montmul(a, cR) = a*c.  Variable*variable costs two.
                if kinds[0] == "const":
                    a = [a[1], a[0]]
                    kinds = [kinds[1], kinds[0]]
                if kinds[1] == "const":
                    cr = (xt.cval[a[1]] * xt.R) % xt.p
                    steps.append(("mul_c", wform(a[0]),
                                  ("bank", bank(cr)), None, i, None))
                    _emit_widen_if_out(i)
                    continue
                t = synth()
                steps.append(("mul", wform(a[0]), wform(a[1]),
                              None, t, None))
                steps.append(("mul_r2", t, None, None, i, None))
                continue
            if op in ("shl_k", "shr_k"):
                steps.append(({"shl_k": "shl_kw", "shr_k": "shr_kw"}[op],
                              wform(a[0]), None, None, i, xt.imms[i]))
                continue
            if op in _C_VARIANTS:
                ops_c = _C_VARIANTS[op]
                if op in ("mul", "add") and kinds[0] == "const":
                    a = [a[1], a[0]]
                    kinds = [kinds[1], kinds[0]]
                if kinds[1] == "const":
                    v = xt.cval[a[1]]
                    if op == "mul" and v == one_v:
                        steps.append(("mul_one", wform(a[0]), None, None,
                                      i, None))
                    elif op == "mul" and v == r2_v:
                        steps.append(("mul_r2", wform(a[0]), None, None,
                                      i, None))
                    else:
                        steps.append((ops_c, wform(a[0]),
                                      ("bank", bank(v)), None, i, None))
                    continue
                if op == "sub" and kinds[0] == "const":
                    steps.append(("csub_c", wform(a[1]),
                                  ("bank", bank(xt.cval[a[0]])),
                                  None, i, None))
                    continue
                steps.append((op, wform(a[0]), wform(a[1]), None,
                              i, None))
                continue
            if op not in _VV_OPS:
                raise UnsupportedTapeOp(
                    f"op '{op}' not supported by the interpreter kernel")
            norm = [wform(x) for x in a]
            pad = norm + [None] * (3 - len(norm))
            steps.append((op, pad[0], pad[1], pad[2], i, None))

        # narrow witness values were widened in place next to their
        # defining steps; remap emissions onto the wide views (any
        # stragglers — e.g. aliased selects — widen at the tail)
        def _wide_out(o):
            o = res(o)
            if isinstance(o, int) and xt.kind[o] == "compute" \
                    and is_nrw(o):
                return wide_of(o)
            return o

        self.xt.out_ids = [_wide_out(o) for o in xt.out_ids]
        out_set = set(x for x in self.xt.out_ids
                      if xt.kind[x] == "compute")

        # --- register allocation ---------------------------------------
        # wide regs: [wide inputs][materialized consts][dynamic][trash]
        # narrow regs: [narrow inputs][narrow consts][dynamic][trash]
        n_win = len(self.win_of)
        n_nin = len(self.nin_of)
        n_fixed = n_win + len(mat_ix)
        self.mat_loads = [
            (n_win + r, tuple(int(x) for x in int_to_limbs(v, L)))
            for v, r in sorted(mat_ix.items(), key=lambda kv: kv[1])
        ]
        n_nfixed = n_nin + len(nmat_ix)
        self.nmat_loads = sorted(
            ((n_nin + r, sv) for sv, r in nmat_ix.items()),
            key=lambda kv: kv[0])

        narrow_ops = sorted({op for (op, *_r) in steps
                             if op in _NARROW_RESULT})
        wide_ops = sorted({op for (op, *_r) in steps
                           if op not in _NARROW_RESULT})
        self.opset_n, self.opset_w = narrow_ops, wide_ops
        self.n_narrow_ops = len(narrow_ops)
        op_id = {op: k for k, op in enumerate(narrow_ops)}
        for k, op in enumerate(wide_ops):
            op_id[op] = self.n_narrow_ops + k

        last_use = {}
        for t, (_op, a, b, c, _i, _aux) in enumerate(steps):
            for x in (a, b, c):
                if isinstance(x, int):
                    last_use[x] = t
        reg_of, nreg_of = {}, {}
        free_w, free_n = [], []
        n_dyn_w = n_dyn_n = 0
        expire = [[] for _ in range(len(steps) + 1)]

        def operand_reg(x, want_narrow):
            if isinstance(x, tuple):
                if x[0] == "bank":
                    return x[1]
                if x[0] == "mat":
                    return n_win + x[1]
                return n_nin + x[1]  # ("nmat", slot)
            if xt.kind[x] == "input":
                idx = xt.iidx[x]
                return (self.nin_of[idx] if want_narrow
                        else self.win_of[idx])
            return nreg_of[x] if want_narrow else reg_of[x]

        table = np.zeros((max(len(steps), 1), 7), np.int32)

        # chunking by emission count
        K = self.K
        starts = [0]
        emit_count = 0
        chunk = 0
        wit_rows = {}  # node -> (chunk, row)
        for t, (op, a, b, c, i, aux) in enumerate(steps):
            for (fl, r) in expire[t]:
                (free_n if fl else free_w).append(r)
            dst_narrow = op in _NARROW_RESULT
            emits = (not dst_narrow) and i in out_set
            if emits and emit_count == K:
                starts.append(t)
                chunk += 1
                emit_count = 0
            files = _OPERAND_FILES.get(op, ("w", "w", "w"))
            cols = []
            for x, f in zip((a, b, c), files):
                if x is None:
                    cols.append(0)
                else:
                    cols.append(operand_reg(x, f == "n"))
            # destination
            if i in last_use and last_use[i] > t:
                if dst_narrow:
                    r = free_n.pop() if free_n else n_nfixed + n_dyn_n
                    if r == n_nfixed + n_dyn_n:
                        n_dyn_n += 1
                    nreg_of[i] = r
                else:
                    r = free_w.pop() if free_w else n_fixed + n_dyn_w
                    if r == n_fixed + n_dyn_w:
                        n_dyn_w += 1
                    reg_of[i] = r
                expire[last_use[i] + 1].append((dst_narrow, r))
                dst = r
            else:
                dst = -1  # trash, patched below
            if emits:
                wit_rows[i] = (chunk, emit_count)
                em = emit_count
                emit_count += 1
            else:
                em = K
            table[t] = (op_id[op], cols[0], cols[1], cols[2], dst, em,
                        aux if aux is not None else 0)
        starts.append(len(steps))
        self.n_win, self.n_nin = n_win, n_nin
        self.n_regs = n_fixed + n_dyn_w + 1    # + wide trash
        self.n_nregs = n_nfixed + n_dyn_n + 1  # + narrow trash
        if self.n_regs > max_regs:
            raise UnsupportedTapeOp(
                f"register file too large ({self.n_regs} > {max_regs})")
        if self.n_nregs > 16 * max_regs:
            raise UnsupportedTapeOp(
                f"narrow register file too large ({self.n_nregs})")
        for t, (op, *_r) in enumerate(steps):
            if table[t, 4] == -1:
                table[t, 4] = (self.n_nregs - 1 if op in _NARROW_RESULT
                               else self.n_regs - 1)
        self.table = table
        self.starts = np.asarray(starts, np.int32)
        self.n_chunks = len(starts) - 1
        self.n_steps = len(steps)
        # --- instruction-table paging: SMEM holds ~1MB, so tapes are
        # split into CALLS of <= max_call_steps; the register files hand
        # off through HBM between calls.  All calls share one padded
        # table shape (one Mosaic kernel).
        MAXS = self.max_call_steps
        calls = []  # (chunk_lo, chunk_hi, s0, s1)
        lo = 0
        for c in range(self.n_chunks):
            if starts[c + 1] - starts[lo] > MAXS and c > lo:
                calls.append((lo, c, starts[lo], starts[c]))
                lo = c
        calls.append((lo, self.n_chunks, starts[lo], starts[-1]))
        self.calls = calls
        self.call_steps = max((s1 - s0) for (_a, _b, s0, s1) in calls)
        self.call_chunks = max((b - a) for (a, b, _s, _t) in calls)
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
    def _make_kernel(self, bb, whole=False):
        L = self.L
        em = self.em
        K = self.K
        n_inputs = self.n_inputs
        mat_loads = self.mat_loads
        nmat_loads = self.nmat_loads
        opset_n, opset_w = self.opset_n, self.opset_w
        N_N = self.n_narrow_ops
        p = self.xt.p
        q_limbs = [int(x) for x in int_to_limbs(p - (1 << 32), L)]

        n_win, n_nin = self.n_win, self.n_nin
        handoff = len(self.calls) > 1
        n_cc = self.call_chunks

        def kernel(starts_ref, opc_ref, ia_ref, ib_ref, ic_ref, dst_ref,
                   em_ref, aux_ref, cb_ref, in_ref, inn_ref, *rest):
            if handoff:
                (rfw_in, rfn_in, out_ref, rfw_out, rfn_out,
                 rf, rf_n, sem) = rest
            else:
                out_ref, rf, rf_n = rest
            g = pl.program_id(0)
            c = pl.program_id(1)
            zero = jnp.zeros((8, bb), jnp.uint32)

            @pl.when(c == 0)
            def _():
                if handoff:
                    # restore the register files from the previous call
                    # (whole-ref copies when the batch block covers the
                    # array: Mosaic rejects minor-dim slices in VMEM)
                    src_w = rfw_in if whole else \
                        rfw_in.at[:, :, :, pl.ds(g * bb, bb)]
                    src_n = rfn_in if whole else \
                        rfn_in.at[:, :, pl.ds(g * bb, bb)]
                    cp = pltpu.make_async_copy(src_w, rf, sem.at[0])
                    cp.start()
                    cp2 = pltpu.make_async_copy(src_n, rf_n, sem.at[1])
                    cp2.start()
                    cp.wait()
                    cp2.wait()
                for k in range(n_win):
                    for i in range(L):
                        rf[k, i] = in_ref[k, i]
                for k in range(n_nin):
                    rf_n[k] = inn_ref[k]
                for (reg, limbs) in mat_loads:
                    for i in range(L):
                        rf[reg, i] = jnp.full((8, bb), np.uint32(limbs[i]),
                                              jnp.uint32)
                for (reg, sv) in nmat_loads:
                    rf_n[reg] = jnp.full((8, bb), np.int32(sv), jnp.int32)

            def step(t, carry):
                ia = ia_ref[t]
                ib = ib_ref[t]
                ic = ic_ref[t]
                aux = aux_ref[t]
                opc = opc_ref[t]
                dst = dst_ref[t]

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

                def widen_rows():
                    # narrow signed int32 -> canonical limb rows:
                    # v >= 0 -> [v & m, v>>16, 0...]; v < 0 -> p + v =
                    # (p - 2^32) + uint32(v), one static carry chain
                    v = rf_n[ia]
                    u = v.astype(jnp.uint32)
                    lo = u & MASK
                    hi = (u >> LIMB_BITS) & MASK
                    neg = v < 0
                    rows = []
                    t0 = lo + np.uint32(q_limbs[0])
                    carry = t0 >> LIMB_BITS
                    rneg = [t0 & MASK]
                    t1 = hi + np.uint32(q_limbs[1]) + carry
                    carry = t1 >> LIMB_BITS
                    rneg.append(t1 & MASK)
                    for i in range(2, L):
                        ti = np.uint32(q_limbs[i]) + carry
                        rneg.append(ti & MASK)
                        carry = ti >> LIMB_BITS
                    rpos = [lo, hi] + [zero] * (L - 2)
                    for i in range(L):
                        rows.append(jnp.where(neg, rneg[i], rpos[i]))
                    return rows

                def shift_w(left):
                    q = (aux // LIMB_BITS).astype(jnp.int32) \
                        if hasattr(aux, "astype") else aux // LIMB_BITS
                    r = (aux % LIMB_BITS).astype(jnp.uint32) \
                        if hasattr(aux, "astype") else aux % LIMB_BITS
                    rows = []
                    for j in range(L):
                        if left:
                            idx = j - q
                            loj = jnp.where(idx >= 0,
                                            rf[ia, jnp.maximum(idx, 0)],
                                            zero)
                            hij = jnp.where(idx - 1 >= 0,
                                            rf[ia,
                                               jnp.maximum(idx - 1, 0)],
                                            zero)
                            v = ((loj << r) & MASK) \
                                | (hij >> (LIMB_BITS - r))
                            rows.append(v & np.uint32(em.mask_list[j]))
                        else:
                            idx = j + q
                            loj = jnp.where(idx < L,
                                            rf[ia, jnp.minimum(idx, L - 1)],
                                            zero)
                            hij = jnp.where(idx + 1 < L,
                                            rf[ia,
                                               jnp.minimum(idx + 1, L - 1)],
                                            zero)
                            rows.append((loj >> r)
                                        | ((hij << (LIMB_BITS - r)) & MASK))
                    if left:
                        return em.cond_sub(rows, zero, zero)
                    return rows

                def wbranch(op):
                    if op == "widen":
                        rows = widen_rows()
                    elif op == "shl_kw":
                        rows = shift_w(True)
                    elif op == "shr_kw":
                        rows = shift_w(False)
                    elif op == "dot2_c":
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

                izero = jnp.zeros((8, bb), jnp.int32)

                def as01(mask):
                    return jnp.where(mask, jnp.int32(1), jnp.int32(0))

                def nnz_wide():
                    acc = rf[ia, 0]
                    for i in range(1, L):
                        acc = acc | rf[ia, i]
                    return acc != 0

                def nbranch(op):
                    na = rf_n[ia]
                    if op == "nmul":
                        return na * rf_n[ib]
                    if op == "nadd":
                        return na + rf_n[ib]
                    if op == "nsub":
                        return na - rf_n[ib]
                    if op == "nsel":
                        return jnp.where(na != 0, rf_n[ib], rf_n[ic])
                    if op == "nsel_w":
                        return jnp.where(nnz_wide(), rf_n[ib], rf_n[ic])
                    if op == "nband":
                        return na & rf_n[ib]
                    if op == "nbor":
                        return na | rf_n[ib]
                    if op == "nbxor":
                        return na ^ rf_n[ib]
                    if op == "nshl":
                        return na << aux
                    if op == "nshr":
                        return na >> aux
                    if op == "nband_w":
                        v = rf[ia, 0] & lax.convert_element_type(
                            cb_ref[aux * L + 0], jnp.uint32)
                        if L > 1:
                            v = v | ((rf[ia, 1] & lax.convert_element_type(
                                cb_ref[aux * L + 1], jnp.uint32))
                                << LIMB_BITS)
                        return v.astype(jnp.int32)
                    if op == "lnot_n":
                        return as01(na == 0)
                    if op == "lnot_w":
                        return as01(~nnz_wide())
                    if op.endswith("_nn"):
                        base = op[:-3]
                        nb = rf_n[ib]
                        if base == "eq":
                            return as01(na == nb)
                        if base == "neq":
                            return as01(na != nb)
                        if base == "lt":
                            return as01(na < nb)
                        if base == "le":
                            return as01(na <= nb)
                        if base == "gt":
                            return as01(na > nb)
                        if base == "ge":
                            return as01(na >= nb)
                        if base == "land":
                            return as01((na != 0) & (nb != 0))
                        if base == "lor":
                            return as01((na != 0) | (nb != 0))
                    if op.endswith("_ww"):
                        rows = em.emit(op[:-3], rd_vv, None, zero)
                    else:
                        raise NotImplementedError(op)
                    return jnp.broadcast_to(rows[0], (8, bb)) \
                        .astype(jnp.int32)

                if N_N and opset_w:
                    @pl.when(opc < N_N)
                    def _():
                        res = lax.switch(
                            opc, [lambda op=op: nbranch(op)
                                  for op in opset_n])
                        rf_n[dst] = res

                    @pl.when(opc >= N_N)
                    def _():
                        res = lax.switch(
                            opc - N_N, [lambda op=op: wbranch(op)
                                        for op in opset_w])
                        rf[dst] = res
                        out_ref[0, em_ref[t]] = res
                elif opset_w:
                    res = lax.switch(
                        opc - N_N, [lambda op=op: wbranch(op)
                                    for op in opset_w])
                    rf[dst] = res
                    out_ref[0, em_ref[t]] = res
                else:
                    res = lax.switch(
                        opc, [lambda op=op: nbranch(op)
                              for op in opset_n])
                    rf_n[dst] = res
                return carry

            lax.fori_loop(starts_ref[c], starts_ref[c + 1], step, 0)

            if handoff:
                @pl.when(c == n_cc - 1)
                def _():
                    dst_w = rfw_out if whole else \
                        rfw_out.at[:, :, :, pl.ds(g * bb, bb)]
                    dst_n = rfn_out if whole else \
                        rfn_out.at[:, :, pl.ds(g * bb, bb)]
                    cp = pltpu.make_async_copy(rf, dst_w, sem.at[0])
                    cp.start()
                    cp2 = pltpu.make_async_copy(rf_n, dst_n, sem.at[1])
                    cp2.start()
                    cp.wait()
                    cp2.wait()

        return kernel

    # ------------------------------------------------------------------
    def _run(self, inputs):
        """uint32 (n_inputs, L, B) -> (n_witness, L, B)."""
        L = self.L
        xt = self.xt
        n_in_prog = max(self.n_inputs, 1)
        _n, _L, B = inputs.shape
        bb = self.lanes
        unit = 8 * bb if (B >= 8 * bb or bb < 128) else 8
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
            # split inputs: wide ones feed the limb register file, range-
            # hinted narrow ones convert to int32 (exact: value < 2^31)
            order_w = sorted(self.win_of, key=self.win_of.get)
            order_n = sorted(self.nin_of, key=self.nin_of.get)
            if order_w:
                x_w = x[np.asarray(order_w)]
            else:
                x_w = jnp.zeros((1, L, 8, B8), jnp.uint32)
            if order_n:
                xs = x[np.asarray(order_n)]
                x_n = xs[:, 0].astype(jnp.int32)
                if L > 1:
                    x_n = x_n | (xs[:, 1].astype(jnp.int32)
                                 << LIMB_BITS)
            else:
                x_n = jnp.zeros((1, 8, B8), jnp.int32)
            if bb < 128 and B8 > bb:
                # Mosaic requires minor block dims 128-divisible or
                # equal to the array dim: register-heavy circuits with
                # sub-128 lanes run the batch in whole-array slices
                parts_b = [
                    self._exec_block(x_w[..., s0:s0 + bb],
                                     x_n[..., s0:s0 + bb], bb, bb,
                                     interp)
                    for s0 in range(0, B8, bb)
                ]
                flat = jnp.concatenate(parts_b, axis=-1)
            else:
                flat = self._exec_block(x_w, x_n, B8, bb, interp)
        else:
            flat = jnp.zeros((1, L, 8, B8), jnp.uint32)

        # gather emissions/inputs/consts into witness order
        const_rows = []
        const_pos = {}
        idx = []
        n_flat = flat.shape[0]
        if self.n_steps and len(self.calls) > 1:
            CC = self.call_chunks
            chunk_base = []
            for ci, (a, b, _s0, _s1) in enumerate(self.calls):
                for g in range(a, b):
                    chunk_base.append(ci * CC * (K + 1)
                                      + (g - a) * (K + 1))
        else:
            chunk_base = [g * (K + 1) for g in range(self.n_chunks)] \
                if self.n_steps else []
        for src in self.wit_src:
            if src[0] == "emit":
                idx.append(chunk_base[src[1]] + src[2])
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

    def _exec_block(self, x_w, x_n, B8, bb, interp):
        """Run the interpreter kernel(s) on one batch group; returns
        the flat emission array (rows, L, 8, B8)."""
        L = self.L
        K = self.K
        t = self.table
        n_win_b = max(self.n_win, 1)
        n_nin_b = max(self.n_nin, 1)
        if len(self.calls) == 1:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                # 1D tables only: SMEM pads the minor dim to 128
                # lanes, so a (n,6) table costs 512B/row (measured
                # OOM at 1879 steps); 1D arrays cost 4B/step.
                num_scalar_prefetch=9,
                grid=(pl.cdiv(B8, bb), self.n_chunks),
                in_specs=[pl.BlockSpec((n_win_b, L, 8, bb),
                                       lambda g, c, *_: (0, 0, 0, g),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((n_nin_b, 8, bb),
                                       lambda g, c, *_: (0, 0, g),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, K + 1, L, 8, bb),
                                       lambda g, c, *_:
                                       (c, 0, 0, 0, g),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((self.n_regs, L, 8, bb), jnp.uint32),
                    pltpu.VMEM((max(self.n_nregs, 1), 8, bb),
                               jnp.int32)],
            )
            emits = pl.pallas_call(
                self._make_kernel(bb),
                out_shape=jax.ShapeDtypeStruct(
                    (self.n_chunks, K + 1, L, 8, B8), jnp.uint32),
                grid_spec=grid_spec,
                interpret=interp,
            )(self.starts, np.ascontiguousarray(t[:, 0]),
              np.ascontiguousarray(t[:, 1]),
              np.ascontiguousarray(t[:, 2]),
              np.ascontiguousarray(t[:, 3]),
              np.ascontiguousarray(t[:, 4]),
              np.ascontiguousarray(t[:, 5]),
              np.ascontiguousarray(t[:, 6]),
              self.cbank.reshape(-1), x_w, x_n)
            return emits.reshape(self.n_chunks * (K + 1), L, 8, B8)
        # multi-call paging: each call interprets a table slice
        # (padded to one shared shape = one Mosaic kernel) and
        # the register files ride through HBM between calls
        CS, CC = self.call_steps, self.call_chunks
        kernel = self._make_kernel(bb, whole=(B8 == bb))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(pl.cdiv(B8, bb), CC),
            in_specs=[pl.BlockSpec((n_win_b, L, 8, bb),
                                   lambda g, c, *_: (0, 0, 0, g),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((n_nin_b, 8, bb),
                                   lambda g, c, *_: (0, 0, g),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=(pl.BlockSpec((1, K + 1, L, 8, bb),
                                    lambda g, c, *_:
                                    (c, 0, 0, 0, g),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                       pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)),
            scratch_shapes=[
                pltpu.VMEM((self.n_regs, L, 8, bb), jnp.uint32),
                pltpu.VMEM((max(self.n_nregs, 1), 8, bb),
                           jnp.int32),
                pltpu.SemaphoreType.DMA((2,))],
        )
        rf_w = jnp.zeros((self.n_regs, L, 8, B8), jnp.uint32)
        rf_nn = jnp.zeros((max(self.n_nregs, 1), 8, B8),
                          jnp.int32)
        parts = []
        for (a, b, s0, s1) in self.calls:
            tb = np.zeros((CS, 7), np.int32)
            tb[:s1 - s0] = t[s0:s1]
            st = np.empty(CC + 1, np.int32)
            seg = self.starts[a:b + 1] - s0
            st[:len(seg)] = seg
            st[len(seg):] = seg[-1]
            emits_i, rf_w, rf_nn = pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct(
                        (CC, K + 1, L, 8, B8), jnp.uint32),
                    jax.ShapeDtypeStruct(rf_w.shape, jnp.uint32),
                    jax.ShapeDtypeStruct(rf_nn.shape, jnp.int32)),
                grid_spec=grid_spec,
                interpret=interp,
            )(st, np.ascontiguousarray(tb[:, 0]),
              np.ascontiguousarray(tb[:, 1]),
              np.ascontiguousarray(tb[:, 2]),
              np.ascontiguousarray(tb[:, 3]),
              np.ascontiguousarray(tb[:, 4]),
              np.ascontiguousarray(tb[:, 5]),
              np.ascontiguousarray(tb[:, 6]),
              self.cbank.reshape(-1), x_w, x_n, rf_w, rf_nn)
            parts.append(emits_i.reshape(CC * (K + 1), L, 8, B8))
        return jnp.concatenate(parts, axis=0)


    def run(self, inputs):
        if self._jit is None:
            self._jit = jax.jit(self._run)
        return self._jit(inputs)

    def stats(self):
        from collections import Counter
        opname = list(self.opset_n) + list(self.opset_w)
        return {
            "steps": self.n_steps,
            "chunks": self.n_chunks,
            "regs": self.n_regs,
            "nregs": self.n_nregs,
            "bank": int(self.cbank.shape[0]),
            "ops": dict(Counter(
                opname[k] for k in self.table[:, 0])),
        }
