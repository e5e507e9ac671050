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

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# perf-ablation knobs (timing experiments only — results are WRONG when
# set): comma list of {noemit, noredc, nostep, nowrite, noplgather}
_ABLATE = set(filter(None, os.environ.get("CTPU_ABLATE", "").split(",")))


def _unpack_bits(rows, shifts):
    """Apply per-row packed-bit extraction: shift -1 keeps the row raw,
    otherwise row := (row >> shift) & 1 (logical shift — packed words
    use all 32 bits)."""
    if not any(s >= 0 for s in shifts):
        return rows
    sh = np.asarray(shifts, np.int32).reshape(
        (-1,) + (1,) * (rows.ndim - 1))
    ext = ((rows.astype(jnp.uint32)
            >> jnp.asarray(np.maximum(sh, 0), jnp.uint32)) & 1) \
        .astype(jnp.int32)
    return jnp.where(jnp.asarray(sh) < 0, rows, ext)

from ..field.primes import LIMB_BITS, FieldSpec
from ..ops.limbs import int_to_limbs
from ..ops.limb_emit import MASK, LimbEmitter
from ..ops.jfield import on_tpu
from .plan import ExpandedTape, UnsupportedTapeOp, expanded_ranges

# ops the interpreter kernel supports (dynamic pow/shl/shr/mod were
# already lowered to these by backend/dynops.py; idiv executes as an
# in-kernel long-division fori_loop)
_VV_OPS = {
    "mul", "add", "sub", "select",
    "eq", "neq", "lt", "le", "gt", "ge",
    "land", "lor", "lnot",
    "band", "bor", "bxor", "bnot",
    "idiv",
}
# ops with a constant operand that get a const-bank variant
_C_VARIANTS = {"mul": "mul_c", "add": "add_c", "sub": "sub_c"}

# comparison/boolean ops: always narrow results; _nn reads the narrow
# register file, _ww the wide one (mixed operands widen first)
_CMP = {"eq", "neq", "lt", "le", "gt", "ge", "land", "lor"}

# opcodes whose result lives in the narrow int32 register file
_NARROW_RESULT = (
    {"nmul", "nadd", "nsub", "nsel", "nsel_w", "nband", "nbor", "nbxor",
     "nshl", "nshr", "nshru", "nband_w", "lnot_n", "lnot_w", "nidiv",
     "ncopy", "nxbit", "nmshl", "nmshru", "nrotr"}
    | {f"{o}_nn" for o in _CMP} | {f"{o}_ww" for o in _CMP}
)

# operand register files per opcode position ('n' narrow / 'w' wide);
# default is all-wide
_OPERAND_FILES = {
    "nmul": ("n", "n", "w"), "nadd": ("n", "n", "w"),
    "nsub": ("n", "n", "w"), "nband": ("n", "n", "w"),
    "nbor": ("n", "n", "w"), "nbxor": ("n", "n", "w"),
    "nsel": ("n", "n", "n"), "nsel_w": ("w", "n", "n"),
    "nidiv": ("n", "n", "w"), "ncopy": ("n", "n", "w"),
    "nshl": ("n", "w", "w"), "nshr": ("n", "w", "w"),
    "nshru": ("n", "w", "w"),
    # fused planner ops (r5): bit extract, mask+shift, rotate —
    # one dispatch instead of two/three on SHA-class hot paths
    "nxbit": ("n", "w", "w"), "nrotr": ("n", "w", "w"),
    "nmshl": ("n", "n", "w"), "nmshru": ("n", "n", "w"),
    "nband_w": ("w", "w", "w"), "widen": ("n", "w", "w"),
    "lnot_n": ("n", "w", "w"), "lnot_w": ("w", "w", "w"),
}
for _o in _CMP:
    _OPERAND_FILES[f"{_o}_nn"] = ("n", "n", "w")
    _OPERAND_FILES[f"{_o}_ww"] = ("w", "w", "w")


class InterpreterProgram:
    """Executable interpreter form of a DomainTape for one field."""

    def __init__(self, dtape, spec: FieldSpec, *, lanes=None,
                 chunk_emits=32, chunk_emits_n=256, interpret=None,
                 max_regs=2048, input_ranges=None, max_call_steps=24_000):
        # max_regs is a sanity backstop; actual capacity is enforced by
        # the VMEM-aware lane selection below (narrow batch blocks for
        # register-heavy circuits).
        self.spec = spec
        self.em = LimbEmitter(spec)
        self.L = spec.n_limbs
        self.K = chunk_emits
        self.KN = chunk_emits_n
        self.interpret = interpret
        self.input_ranges = input_ranges or {}
        self.max_call_steps = max_call_steps
        self.n_inputs = dtape.n_inputs
        self.xt = ExpandedTape(dtape, spec)
        self._plan(max_regs)
        self.n_witness = len(self.xt.out_ids)
        # large narrow input sets skip the double-buffered VMEM block:
        # they live in HBM and DMA straight into their rf_n slots once
        # per batch block (SHA-class circuits have 512+ bit inputs)
        self.hbm_nin = self.n_nin > 64
        if lanes is None:
            # widest batch block that keeps the register files + double-
            # buffered in/out blocks inside ~13MB of the 16MB VMEM
            # (256 lanes measured ~4% faster than 128 on Poseidon2).
            # Physical VMEM tiles are (8,128): a tile's cost doesn't
            # shrink below 128 lanes.
            tiles = (self.n_regs * self.L + self.n_nregs
                     + 2 * (self.K + 2) * self.L
                     + 2 * (self.KN + 2)
                     + 2 * max(self.n_win, 1) * self.L
                     + 2 * (1 if self.hbm_nin else max(self.n_nin, 1)))
            lanes = 8
            for cand in (256, 128, 64, 32, 16, 8):
                if tiles * 8 * max(cand, 128) * 4 <= 13 << 20:
                    lanes = cand
                    break
            if tiles * 8 * 128 * 4 > 13 << 20:
                raise UnsupportedTapeOp(
                    f"register files exceed VMEM ({tiles} tiles)")
        self.lanes = lanes
        # Pallas unblock-gather for the witness (parallel/mesh.py turns
        # this off under shard_map: manual-DMA kernels inside shard_map
        # regions fail to remote-compile through the axon relay)
        self.pl_gather = True
        # raw_out=True returns the gather's block layout (W[, L], 8,
        # G, bb) — byte-identical to (W[, L], B) when B is unpadded —
        # skipping the device-side retile; bench/streaming consumers
        # reshape host-side for free
        self.raw_out = False
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

        def nmat_signed(sv):
            """Narrow const slot for a raw signed int32 bit pattern."""
            hit = nmat_ix.get(sv)
            if hit is None:
                hit = nmat_ix[sv] = len(nmat_ix)
            return hit

        def nmaterialize(v):
            return nmat_signed(signed_of(v))

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

        rngx = expanded_ranges(xt, self.input_ranges)
        roots, absorbed = {}, set()

        # --- split-sum pre-pass -----------------------------------------
        # Bit-decomposition sums (AddModW `lc` in SHA, Num2Bits-style
        # hints — the reference executes these as full field arithmetic
        # in its runtimes, witness_calculator.js:131-211): a wide
        # add-tree X = sum(narrow terms) whose ONLY consumers are
        # (X >> k) & m extractions never needs limb form.  Keep it as
        # two int32 component sums with X = S_lo + 2^16*S_hi exactly:
        #   bits 0..15 of X  == bits 0..15 of S_lo   (2^16*S_hi ≡ 0)
        #   X >> 16          == S_hi + (S_lo >> 16)  =: T
        # so every extraction is a narrow shift+mask.  Weight products
        # (bit*2^k, CSE'd across sums in the tape) are REMATERIALIZED
        # per sum: shared product nodes otherwise stay live for ~16 SHA
        # rounds (measured 2,048 >20k-step live spans = a 14MB narrow
        # register file).
        split_plan = {}    # root -> (lo_terms, hi_terms, K_lo, K_hi)
        split_shr = {}     # shr node -> (root, k)
        splitrep = {}      # root -> (lo_node, t_node), filled at emit
        consumers = {}
        for i in comp:
            for x in xt.args[i]:
                consumers.setdefault(x, []).append(i)

        def _split_leaf(x):
            """(lo_terms, hi_terms, lo_ub, hi_ub) for leaf x, items are
            ('node', id), ('prod', arg, const), ('lo16'/'hi16', id);
            None if unsplittable.  Constant-weight products split by
            their constant (bit*2^k with k>=16 contributes only to the
            hi sum, as bit*2^(k-16))."""
            if xt.kind[x] == "compute" and xt.ops[x] == "mulp":
                a0, a1 = xt.args[x]
                if xt.kind[a1] == "const":
                    v, cn = a0, a1
                elif xt.kind[a0] == "const":
                    v, cn = a1, a0
                else:
                    v = cn = None
                if v is not None:
                    rv = rngx[v]
                    c = xt.cval[cn]
                    if rv is None or rv[0] < 0 or c >= (1 << 47) \
                            or not is_nrw(v):
                        return None
                    c_lo, c_hi = c & 0xffff, c >> 16
                    if c_lo * rv[1] > NM31 or c_hi * rv[1] > NM31:
                        return None
                    lo = [("prod", v, c_lo)] if c_lo else []
                    hi = [("prod", v, c_hi)] if c_hi else []
                    return (lo, hi, c_lo * rv[1], c_hi * rv[1])
            r = rngx[x]
            if is_nrw(x) and r is not None and r[0] >= 0:
                return ([("node", x)], [], r[1], 0)
            return None

        split_prod_uses = {}
        for i in reversed(comp):
            if xt.ops[i] != "add" or is_nrw(i) or i in absorbed \
                    or i in out_set:
                continue
            cons = consumers.get(i, [])
            if not cons:
                continue
            ok, shrs = True, []
            for j in cons:
                if xt.kind[j] != "compute" or xt.ops[j] != "shr_k" \
                        or xt.args[j][0] != i:
                    ok = False
                    break
                k = xt.imms[j]
                if k < 16:
                    if j in out_set:
                        ok = False
                        break
                    for j2 in consumers.get(j, []):
                        if xt.ops[j2] != "band":
                            ok = False
                            break
                        ms = [x for x in xt.args[j2]
                              if xt.kind[x] == "const"]
                        if len(ms) != 1 \
                                or xt.cval[ms[0]] >= (1 << (16 - k)):
                            ok = False
                            break
                    if not ok:
                        break
                shrs.append((j, k))
            if not ok:
                continue
            leaves, K_acc, local = [], 0, []
            stack = list(xt.args[i])
            while stack:
                x = stack.pop()
                if xt.kind[x] == "const":
                    K_acc = (K_acc + xt.cval[x]) % xt.p
                    continue
                if (xt.kind[x] == "compute" and xt.ops[x] == "add"
                        and not is_nrw(x) and uses.get(x, 0) == 1
                        and x not in out_set and x not in absorbed):
                    local.append(x)
                    stack.extend(xt.args[x])
                    continue
                leaves.append(x)
            if K_acc >= (1 << 46):
                continue
            lo_t, hi_t = [], []
            lo_ub = K_acc & 0xffff
            hi_ub = K_acc >> 16
            for x in leaves:
                parts = _split_leaf(x)
                if parts is None:
                    ok = False
                    break
                pl_, ph_, lu, hu = parts
                if lo_ub + lu > NM31 and pl_ == [("node", x)]:
                    # lo sum would overflow int32: split the whole-value
                    # leaf into 16-bit halves (2 extra narrow ops)
                    pl_ = [("lo16", x)]
                    ph_ = ph_ + [("hi16", x)]
                    lu, hu = 0xffff, rngx[x][1] >> 16
                lo_t.extend(pl_)
                hi_t.extend(ph_)
                lo_ub += lu
                hi_ub += hu
            if not ok or not lo_t or lo_ub > NM31 \
                    or hi_ub + (lo_ub >> 16) > NM31:
                continue
            split_plan[i] = (lo_t, hi_t, K_acc & 0xffff, K_acc >> 16)
            absorbed.update(local)
            for (j, k) in shrs:
                split_shr[j] = (i, k)
                node_narrow[j] = True
                if k >= 16:
                    # exact value of X >> k (k<16 extractions are only
                    # valid under their band masks; leave range unknown)
                    rngx[j] = (0, (lo_ub + (hi_ub << 16)) >> k)
            for x in leaves:
                if xt.kind[x] == "compute" and xt.ops[x] == "mulp":
                    split_prod_uses[x] = split_prod_uses.get(x, 0) + 1
        # product nodes used only as split-sum leaves never materialize
        for x, n_su in split_prod_uses.items():
            if n_su == uses.get(x, 0) and x not in out_set:
                absorbed.add(x)
        # snapshot: bitpack's consumer analysis must distinguish
        # split-sum absorption (packed words are consumed whole there)
        # from the later lincomb/nroot absorption (scalar operands)
        split_absorbed = set(absorbed)

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

        for i in reversed(comp):
            if xt.ops[i] != "add" or i in absorbed or is_nrw(i) \
                    or i in split_plan:
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
        NM = (1 << 31) - 1
        nroots = {}
        for i in reversed(comp):
            if xt.ops[i] != "add" or is_nrw(i) or i in absorbed \
                    or i in roots or i in split_plan:
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

        if os.environ.get("CTPU_DEBUG"):
            print(f"# plan: split={len(split_plan)} roots={len(roots)} "
                  f"nroots={len(nroots)} absorbed={len(absorbed)}")
        import collections as _c
        _dbg_rest = _c.Counter()

        # --- word-level bit packing (SHA-class; backend/bitpack.py) ---
        bitpack = None
        if split_shr or len(self.nin_of) >= 64:
            from . import bitpack as _bitpack
            bitpack = _bitpack.analyze(
                xt, comp, rngx, split_plan, split_shr, self.nin_of,
                out_set, consumers, split_absorbed)
        fam_member = bitpack.member if bitpack else {}

        # --- narrow word-sum pass -------------------------------------
        # CSE-shared NARROW add-trees of bit*2^k products (binsum
        # partial sums in SHA) bypass both the split-sum pass and the
        # nroots reassociation (wide roots only), leaving their
        # products to execute scalar (~5.3k nmul + ~5.4k nadd on
        # SHA256 post-DCE).  Same cure as the split path: group
        # family-member / input-atom products into whole masked+
        # shifted packed words via _grouped; the tree is proven int32
        # so the group sums stay narrow with no lo/hi split.
        nword_plan = {}
        if bitpack is not None:
            half_p = xt.p >> 1
            nword_prod_uses = {}
            for i in reversed(comp):
                if xt.ops[i] != "add" or not is_nrw(i) \
                        or i in absorbed or i in fam_member \
                        or rngx[i] is None:
                    continue
                leaves, K_acc, local = [], 0, []
                stack = list(xt.args[i])
                while stack:
                    x = stack.pop()
                    if xt.kind[x] == "const":
                        K_acc = (K_acc + xt.cval[x]) % xt.p
                        continue
                    if (xt.kind[x] == "compute" and xt.ops[x] == "add"
                            and is_nrw(x) and uses.get(x, 0) == 1
                            and x not in out_set and x not in absorbed
                            and x not in fam_member
                            and x not in nword_plan):
                        local.append(x)
                        stack.extend(xt.args[x])
                        continue
                    leaves.append(x)
                K_sv = K_acc if K_acc <= half_p else K_acc - xt.p
                if abs(K_sv) > NM31:
                    continue
                # classify leaves; track positive/negative partial-sum
                # bounds (any accumulation order must stay int32)
                items, prods = [], []
                groups = {}
                pos_b = max(K_sv, 0)
                neg_b = min(K_sv, 0)
                ok = True
                for x in leaves:
                    r = rngx[x]
                    if r is None:
                        ok = False
                        break
                    pos_b += max(r[1], 0)
                    neg_b += min(r[0], 0)
                    v = c = None
                    if xt.kind[x] == "compute" and xt.ops[x] == "mulp":
                        a0, a1 = xt.args[x]
                        if xt.kind[a1] == "const":
                            v, cn = a0, a1
                        elif xt.kind[a0] == "const":
                            v, cn = a1, a0
                        else:
                            v = None
                        if v is not None:
                            c = xt.cval[cn]
                            if not c or (c & (c - 1)) \
                                    or not (v in fam_member
                                            or v in bitpack.atom):
                                v = None
                    if v is not None:
                        m = fam_member.get(v)
                        sk = (("f", m[0]) if m is not None
                              else ("v", bitpack.atom[v][0]))
                        p_ = (m[1] if m is not None
                              else bitpack.atom[v][1])
                        groups.setdefault(
                            (sk, c.bit_length() - 1 - p_),
                            []).append((x, v, c))
                    else:
                        items.append(("node", x))
                if not ok or pos_b > NM31 or neg_b < -NM31:
                    continue
                n_grouped = sum(len(g) for g in groups.values()
                                if len(g) >= 3)
                if n_grouped < 3:
                    continue
                for g in groups.values():
                    for (x, v, c) in g:
                        items.append(("prod", v, c))
                        prods.append(x)
                nword_plan[i] = (items, K_acc)
                absorbed.update(local)
                for x in prods:
                    nword_prod_uses[x] = nword_prod_uses.get(x, 0) + 1
            # product nodes whose every use is covered by split-sum
            # leaves and/or nword groups never materialize scalar
            for x, n_su in nword_prod_uses.items():
                if n_su + split_prod_uses.get(x, 0) \
                        == uses.get(x, 0) and x not in out_set:
                    absorbed.add(x)
            if os.environ.get("CTPU_DEBUG") and nword_plan:
                print(f"# nword: {len(nword_plan)} narrow word-sums, "
                      f"{len(nword_prod_uses)} grouped products")
        self.n_nword = len(nword_plan)
        vec_words, fam_words = {}, {}

        def emit_n1(op, a, imm=None):
            nid = synth(True)
            steps.append((op, a, None, None, nid, imm))
            return nid

        def emit_n2(op, a, b):
            nid = synth(True)
            steps.append((op, a, b, None, nid, None))
            return nid

        def emit_n2i(op, a, b, imm):
            nid = synth(True)
            steps.append((op, a, b, None, nid, imm))
            return nid

        def cword(sv):
            return ("nmat", nmat_signed(sv))

        def as_node(h):
            """Materialize a const handle as a narrow register node
            (needed when a packed word is itself emitted)."""
            if isinstance(h, tuple):
                return emit_n2("nbor", h, h)
            return h

        def get_vec_word(vec):
            """Packed 32-bit word for an atom vector."""
            w = vec_words.get(vec)
            if w is not None:
                return w
            if vec[0] == "sum":
                lo, t_n = splitrep[vec[1]]
                a = emit_n2("nband", lo, cword(0xffff))
                w = emit_n2("nbor", a,
                            emit_n2i("nmshl", t_n, cword(0xffff), 16))
            else:  # ("in", word index): assemble from input bit nodes
                bits = bitpack.in_words[vec]
                parts = [emit_n1("nshl", nform(n), k) if k else nform(n)
                         for k, n in sorted(bits.items())]
                while len(parts) > 1:
                    nxt = [emit_n2("nbor", parts[j], parts[j + 1])
                           for j in range(0, len(parts) - 1, 2)]
                    if len(parts) % 2:
                        nxt.append(parts[-1])
                    parts = nxt
                w = parts[0]
                if not isinstance(w, tuple) and xt.kind[w] != "compute":
                    # a single-bit word at shift 0 is the raw input
                    # node; packed words must be compute registers so
                    # an emitb witness row has an emission step to
                    # gather from (advisor r4 finding)
                    w = emit_n1("ncopy", w)
            vec_words[vec] = w
            return w

        atom_words = {}

        def atom_word(vec, rot, raws):
            """Aligned word: bit p holds vec[(p + rot) mod 32], by
            logical shift when no member wraps, ROTR when some do.
            Memoized on (vec, rot, shift directions): sigma-family
            rotations repeat across gadget families (~1.4k duplicate
            syntheses on SHA256, ~2 ops each)."""
            key = (vec, rot, any(r >= 0 for r in raws),
                   any(r < 0 for r in raws))
            w = atom_words.get(key)
            if w is not None:
                return w
            W = get_vec_word(vec)
            if rot == 0:
                atom_words[key] = W
                return W
            if key[2] and key[3]:
                w = emit_n1("nrotr", W, rot)  # fused rotate (1 step)
            elif key[2]:
                w = emit_n1("nshru", W, rot)
            else:
                w = emit_n1("nshl", W, 32 - rot)
            atom_words[key] = w
            return w

        def get_fam_word(fi):
            w = fam_words.get(fi)
            if w is not None:
                return w
            f = bitpack.fams[fi]
            words = [atom_word(vec, rot, f.wraps[k])
                     for k, (vec, rot) in enumerate(f.atoms)]
            if f.tt == (0, 1):
                w = words[0]
            else:
                w = _bitpack.synth_tt(f.tt, words, emit_n2, cword)
            w = fam_words[fi] = as_node(w)
            return w

        def _nterm(it):
            """Narrow register holding one split-sum term."""
            if it[0] == "node":
                return nform(sres(it[1]))
            if it[0] == "lo16":
                nid = synth(True)
                steps.append(("nband", nform(res(it[1])),
                              ("nmat", nmaterialize(0xffff)), None,
                              nid, None))
                return nid
            if it[0] == "hi16":
                nid = synth(True)
                steps.append(("nshr", nform(res(it[1])), None, None,
                              nid, 16))
                return nid
            _tag, v, c = it
            nid = synth(True)
            steps.append(("nmul", nform(sres(v)),
                          ("nmat", nmaterialize(c)), None, nid, None))
            return nid

        def _nsum(terms, k_const, extra=()):
            """nadd reduction over split-sum terms (+ constant);
            returns the operand (register id or nmat tuple).  Eight
            parallel accumulator chains + a final tree: wide enough
            that the run scheduler batches the adds, narrow enough
            that only ~8 partials are live (a full balanced tree keeps
            n/2 partials live and blows the register file)."""
            parts = list(extra) + [_nterm(it) for it in terms]
            if k_const:
                parts.append(("nmat", nmaterialize(k_const)))
            A = 8
            if len(parts) > 2 * A:
                accs = list(parts[:A])
                for j, x in enumerate(parts[A:]):
                    nid = synth(True)
                    steps.append(("nadd", accs[j % A], x, None,
                                  nid, None))
                    accs[j % A] = nid
                parts = accs
            while len(parts) > 1:
                nxt = []
                for j in range(0, len(parts) - 1, 2):
                    nid = synth(True)
                    steps.append(("nadd", parts[j], parts[j + 1], None,
                                  nid, None))
                    nxt.append(nid)
                if len(parts) % 2:
                    nxt.append(parts[-1])
                parts = nxt
            return parts[0]

        scalar_bits = {}

        def scalar_bit(n):
            """Materialize one packed member as a scalar 0/1 register
            ((W >> p) & 1), memoized."""
            h = scalar_bits.get(n)
            if h is None:
                fi, p = fam_member[n]
                W = get_fam_word(fi)
                h = emit_n1("nxbit", W, p)  # fused (W >>u p) & 1
                scalar_bits[n] = h
            return h

        def sres(x):
            """res() + lazy scalar extraction of packed members: any
            plan site that reads a packed bit as a scalar operand gets
            the 2-op extraction at its own position; DCE later removes
            chains whose consumers all packed away."""
            x = res(x)
            if x in fam_member:
                return scalar_bit(x)
            return x

        def _grouped(items):
            """Partition split-sum terms: bit-products of packed family
            members group into whole shifted/masked packed words (one
            32-term word sum becomes ~2 ops); the rest stay scalar."""
            groups, rest = {}, []
            for it in items:
                v = c = None
                if it[0] == "prod" and it[2] and (it[2] & (it[2] - 1)) \
                        == 0:
                    v, c = res(it[1]), it[2]
                elif it[0] == "node":
                    v, c = res(it[1]), 1
                src = None
                if v is not None:
                    m = fam_member.get(v)
                    if m is not None:
                        src = (("f", m[0]), m[1])
                    elif xt.kind[v] == "input":
                        at = bitpack.atom.get(v)
                        if at is not None:
                            src = (("v", at[0]), at[1])
                if src is None:
                    if os.environ.get("CTPU_DEBUG"):
                        _dbg_rest[(it[0],
                                   xt.ops[v] if v is not None
                                   and xt.kind[v] == "compute"
                                   else "?")] += 1
                    rest.append(it)
                    continue
                (sk, p) = src[0], src[1]
                d = c.bit_length() - 1 - p     # weight k = p + d
                g = groups.setdefault((sk, d), [0, [], []])
                if g[0] & (1 << p):
                    # DUPLICATED term (same bit, same weight — e.g. a
                    # source-level `x + x`): a mask bit can only count
                    # it once, so extra occurrences stay scalar
                    rest.append(it)
                    continue
                g[0] |= 1 << p
                g[1].append(p)
                g[2].append(it)
            extra = []
            for (sk, d), (mask, ps, its) in groups.items():
                if os.environ.get("CTPU_DEBUG"):
                    _dbg_rest[("grp", len(ps) if len(ps) < 3
                               else ">=3")] += 1
                if len(ps) < 3:
                    # not worth word ops: scalar term (with extraction
                    # for packed members; input bits read directly)
                    for p, it in zip(ps, its):
                        if sk[0] == "f":
                            n = bitpack.fams[sk[1]].nodes[p]
                            h = scalar_bit(n)
                            w = 1 << (p + d)
                            rest.append(("node", h) if w == 1
                                        else ("prod", h, w))
                        else:
                            rest.append(it)
                    continue
                if sk[0] == "f":
                    V = get_fam_word(sk[1])
                    full = mask == 0xffffffff \
                        and len(bitpack.fams[sk[1]].nodes) == 32
                else:
                    V = get_vec_word(sk[1])
                    present = 0
                    for k2 in bitpack.in_words[sk[1]]:
                        present |= 1 << k2
                    full = mask == present
                if not full:
                    sm = mask if mask < (1 << 31) else mask - (1 << 32)
                    if d > 0:
                        V = emit_n2i("nmshl", V, cword(sm), d)
                    elif d < 0:
                        V = emit_n2i("nmshru", V, cword(sm), -d)
                    else:
                        V = emit_n2("nband", V, cword(sm))
                elif d > 0:
                    V = emit_n1("nshl", V, d)
                elif d < 0:
                    V = emit_n1("nshru", V, -d)
                extra.append(V)
            return extra, rest

        for i in comp:
            if i in absorbed:
                continue
            if bitpack is not None and i in fam_member:
                if i in out_set:
                    # synthesize the packed word AT the first emitted
                    # member's position — deferring to the tape tail
                    # would keep every atom register (sum lo/t pairs)
                    # live to the end and blow the register file
                    get_fam_word(fam_member[i][0])
                continue
            if i in split_plan:
                lo_t, hi_t, k_lo, k_hi = split_plan[i]
                if bitpack is not None:
                    lo_x, lo_t = _grouped(lo_t)
                    hi_x, hi_t = _grouped(hi_t)
                else:
                    lo_x = hi_x = ()
                lo = _nsum(lo_t, k_lo, lo_x)
                car = synth(True)
                steps.append(("nshr", lo, None, None, car, 16))
                if hi_t or hi_x or k_hi:
                    hi = _nsum(hi_t, k_hi, hi_x)
                    t_n = synth(True)
                    steps.append(("nadd", hi, car, None, t_n, None))
                else:
                    t_n = car
                splitrep[i] = (lo, t_n)
                continue
            if xt.ops[i] == "shr_k" and xt.args[i][0] in splitrep:
                lo, t_n = splitrep[xt.args[i][0]]
                k = xt.imms[i]
                if k < 16:
                    steps.append(("nshr", lo, None, None, i, k))
                elif k == 16:
                    alias[i] = t_n
                else:
                    steps.append(("nshr", t_n, None, None, i, k - 16))
                continue
            if i in nword_plan:
                its, kc = nword_plan[i]
                extra, rest = _grouped(its)
                acc = _nsum(rest, kc, extra)
                alias[i] = as_node(acc)
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
                    acc_n = sres(grp[0])
                    for x in grp[1:]:
                        nid = synth(True)
                        steps.append(("nadd", nform(acc_n),
                                      nform(sres(x)), None, nid, None))
                        acc_n = nid
                    wparts.append(wide_of(acc_n))
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
                terms, bares, K_acc = [
                    [(sres(x), c) for (x, c) in roots[i][0]],
                    [sres(x) for x in roots[i][1]],
                    roots[i][2]]
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
            a = [sres(x) for x in xt.args[i]]
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
                continue
            if op == "lnot":
                if is_nrw(a[0]):
                    steps.append(("lnot_n", a[0], None, None, i, None))
                else:
                    steps.append(("lnot_w", wform(a[0]), None, None,
                                  i, None))
                node_narrow[i] = True
                continue
            if nrw_i and op in ("mulp", "add", "sub"):
                nop = {"mulp": "nmul", "add": "nadd", "sub": "nsub"}[op]
                steps.append((nop, nform(a[0]), nform(a[1]), None,
                              i, None))
                continue
            if nrw_i and op == "select":
                x1, x2 = nform(a[1]), nform(a[2])
                if kinds[0] != "const" and not is_nrw(a[0]):
                    steps.append(("nsel_w", a[0], x1, x2, i, None))
                else:
                    steps.append(("nsel", nform(a[0]), x1, x2, i, None))
                continue
            if nrw_i and op == "band":
                cargs = [x for x, k in zip(a, kinds) if k == "const"]
                vargs = [x for x, k in zip(a, kinds) if k != "const"]
                if len(vargs) == 2 and all(is_nrw(x) for x in vargs):
                    steps.append(("nband", vargs[0], vargs[1], None,
                                  i, None))
                    continue
                if len(vargs) == 1 and is_nrw(vargs[0]) and cargs:
                    steps.append(("nband", vargs[0], nform(cargs[0]),
                                  None, i, None))
                    continue
                if len(vargs) == 1 and cargs \
                        and xt.cval[cargs[0]] <= (1 << 31) - 1:
                    # wide value masked by a small constant -> narrow
                    steps.append(("nband_w", wform(vargs[0]), None, None,
                                  i, bank(xt.cval[cargs[0]])))
                    continue
                node_narrow[i] = False
                nrw_i = False  # fall through to the wide band
            if nrw_i and op in ("bor", "bxor"):
                steps.append(({"bor": "nbor", "bxor": "nbxor"}[op],
                              nform(a[0]), nform(a[1]), None, i, None))
                continue
            if nrw_i and op in ("shl_k", "shr_k"):
                steps.append(({"shl_k": "nshl", "shr_k": "nshr"}[op],
                              nform(a[0]), None, None, i, xt.imms[i]))
                continue
            if nrw_i and op == "idiv":
                # both operands proven nonneg int32 (ranges.py gate):
                # plain int32 division, idiv(a, 0) = 0
                steps.append(("nidiv", nform(a[0]), nform(a[1]), None,
                              i, None))
                continue

            # ---- wide ops ---------------------------------------------
            if op == "mulp":
                if kinds[0] == "const":
                    a = [a[1], a[0]]
                    kinds = [kinds[1], kinds[0]]
                if xt.plain:
                    # goldilocks: fold-reduced plain product (gl_mul)
                    if kinds[1] == "const":
                        steps.append(("gmul_c", wform(a[0]),
                                      ("bank", bank(xt.cval[a[1]])),
                                      None, i, None))
                    else:
                        steps.append(("gmul", wform(a[0]), wform(a[1]),
                                      None, i, None))
                    continue
                # plain product on the wide lane; by a constant it is a
                # single montmul with the constant pre-scaled by R:
                # montmul(a, cR) = a*c.  Variable*variable costs two.
                if kinds[1] == "const":
                    cr = (xt.cval[a[1]] * xt.R) % xt.p
                    steps.append(("mul_c", wform(a[0]),
                                  ("bank", bank(cr)), None, i, None))
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

        if os.environ.get("CTPU_DEBUG"):
            print("# rest terms:", dict(_dbg_rest.most_common(10)))

        # narrow witness values stream out RAW (int32 emission buffer,
        # limb conversion happens vectorized outside the kernel), so no
        # widen steps are needed for emission — only alias resolution.
        self.xt.out_ids = [res(o) for o in xt.out_ids]
        out_set = set(x for x in self.xt.out_ids
                      if xt.kind[x] == "compute")

        # packed-family witness members emit ONE packed word row; the
        # gather unpacks (row >> bit) & 1 per witness index (bit_src)
        bit_src = {}
        if bitpack is not None:
            for nid in list(out_set):
                if nid in fam_member:
                    fi, p = fam_member[nid]
                    bit_src[nid] = (get_fam_word(fi), p)
            out_set -= set(bit_src)
            out_set.update(w for (w, _p) in bit_src.values())
        self._bit_src = bit_src

        # --- deferred from-Mont emission pass ---------------------------
        # Poseidon-class circuits spend ~40% of their steps on
        # emission-only Montgomery output conversions (montmul(x, 1) =
        # REDC(x)); the reference's runtimes pay the same conversion
        # per witness store (Fr_toLongNormal, main.cpp:211-212).  Here
        # each such mul_one step is DELETED: the producer's Montgomery
        # row is emitted raw and the kernel REDCs the whole emission
        # block once per chunk as a single (K+1, 8, bb)-slab op under a
        # per-row mask — one traced body, no per-step dispatch, no
        # extra HBM traffic (the block is still in VMEM).
        defer_src = {}      # conversion node -> producer node
        producers = set()
        if not xt.plain:
            used = {}
            for (op, a, b, c, _i, _aux) in steps:
                for x in (a, b, c):
                    if isinstance(x, int):
                        used[x] = used.get(x, 0) + 1
            kept = []
            for st in steps:
                (op, a, b, _c, i, _aux) = st
                if (op == "mul_one" and i in out_set
                        and used.get(i, 0) == 0
                        and isinstance(a, int)
                        and xt.kind[a] == "compute"
                        and a not in out_set
                        and not node_narrow.get(a, False)):
                    defer_src[i] = a
                    out_set.add(a)
                    producers.add(a)
                    continue
                kept.append(st)
            steps = kept
        self.defer_src = defer_src

        # --- witness passthrough copies ---------------------------------
        # input/const witness rows get explicit copy steps so EVERY
        # witness value is an emission row: the device-side unblock
        # gather then reads one homogeneous bank (no concatenated
        # input/const side banks, which cost a full extra HBM pass).
        # consts ride the narrow stream ONLY when the circuit has no
        # wide emissions (SHA-class): on a wide circuit a single
        # narrow const row (the witness's constant-1 wire) would make
        # idx_n non-empty and knock the whole witness off the Pallas
        # fast gather — ~20 ms of XLA take/reshape glue on
        # Poseidon2-64k (r5 profile; this was a silent r4 regression)
        has_wide_emit = any(st[4] in out_set
                            and st[0] not in _NARROW_RESULT
                            for st in steps)
        for nid in dict.fromkeys(self.xt.out_ids):
            k = xt.kind[nid]
            if k == "compute":
                continue
            if k == "const":
                v = xt.cval[nid]
                if nfits(v) and not has_wide_emit:
                    # int32-fitting consts on the narrow stream: a
                    # wide copy would open a wide emission buffer
                    # (2(K+2)L VMEM tiles) just for them on otherwise
                    # pure-narrow circuits (SHA)
                    steps.append(("ncopy", ("nmat", nmaterialize(v)),
                                  None, None, nid, None))
                else:
                    steps.append(("copyw", ("mat", materialize(v)),
                                  None, None, nid, None))
            elif xt.iidx[nid] in self.nin_of:
                steps.append(("ncopy", nid, None, None, nid, None))
            else:
                steps.append(("copyw", nid, None, None, nid, None))
            out_set.add(nid)

        # DCE: packing replaces whole per-bit step chains (the shr/band
        # extraction scaffolding feeding only packed gadgets goes dead)
        needed = set(out_set)
        kept_rev = []
        for st in reversed(steps):
            if st[4] in needed:
                kept_rev.append(st)
                for x in (st[1], st[2], st[3]):
                    if isinstance(x, int):
                        needed.add(x)
        steps = kept_rev[::-1]

        if os.environ.get("CTPU_DEBUG"):
            import collections as _c2
            n_orig0 = next((k for k in range(len(xt.ops))
                            if xt.ops[k] == "_tmp"), len(xt.ops))
            cnt = _c2.Counter(
                (st[0], "synth" if st[4] >= n_orig0 else "orig")
                for st in steps)
            print("# post-DCE steps:", dict(cnt.most_common(14)))

        steps = self._schedule_runs(steps)

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

        # emission buffers: wide rows and RAW narrow int32 rows stream
        # through separate chunked blocks; size each to the tape so the
        # unused stream costs ~nothing (Poseidon: KN=0; SHA: K=0)
        n_wout = n_nout = 0
        for (op, _a, _b, _c, i, _x) in steps:
            if i in out_set:
                if op in _NARROW_RESULT:
                    n_nout += 1
                else:
                    n_wout += 1
        K = min(self.K, n_wout)
        KN = min(self.KN, n_nout)
        self.K, self.KN = K, KN

        # chunking by emission count; a chunk also never exceeds
        # max_call_steps so multi-call paging can always split on a
        # chunk boundary (long emission-free stretches otherwise made
        # single calls whose tables blow the SMEM budget)
        starts = [0]
        emit_w = emit_n = 0
        chunk = 0
        wit_rows = {}    # node -> (chunk, row) in the wide stream
        wit_rows_n = {}  # node -> (chunk, row) in the narrow stream
        mont_rows = set()  # (chunk, row): Montgomery rows REDC'd in-kernel
        for t, (op, a, b, c, i, aux) in enumerate(steps):
            for (fl, r) in expire[t]:
                (free_n if fl else free_w).append(r)
            dst_narrow = op in _NARROW_RESULT
            emits = i in out_set
            if (emits and ((not dst_narrow and emit_w == K)
                           or (dst_narrow and emit_n == KN))) \
                    or t - starts[-1] >= self.max_call_steps:
                starts.append(t)
                chunk += 1
                emit_w = emit_n = 0
            files = _OPERAND_FILES.get(op, ("w", "w", "w"))
            cols = []
            for x, f in zip((a, b, c), files):
                if x is None:
                    cols.append(0)
                else:
                    cols.append(operand_reg(x, f == "n"))
            # destination (passthrough-copy steps of input/const nodes
            # never allocate: operands resolve to input/const slots)
            if i in last_use and last_use[i] > t \
                    and xt.kind[i] == "compute":
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
            if emits and dst_narrow:
                wit_rows_n[i] = (chunk, emit_n)
                em = emit_n
                emit_n += 1
            elif emits:
                wit_rows[i] = (chunk, emit_w)
                if i in producers:
                    mont_rows.add((chunk, emit_w))
                em = emit_w
                emit_w += 1
            else:
                em = KN if dst_narrow else K
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
        # per-emission-row Montgomery flags for the in-kernel trailing
        # REDC slab (deferred from-Mont pass above)
        mont_tab = np.zeros((self.n_chunks * (K + 1),), np.int32)
        for (g, r) in mont_rows:
            mont_tab[g * (K + 1) + r] = 1
        self.mont_tab = mont_tab
        self.mont_any = bool(mont_tab.any())
        self.n_mont_rows = int(mont_tab.sum())
        # run tables: maximal same-opcode step ranges within a chunk;
        # the kernel dispatches ONE lax.switch per run
        starts_at = {s: c for c, s in enumerate(starts[:-1])}
        r_op, r_s0 = [], []
        rstarts = [0] * len(starts)
        prev = None
        for t, st in enumerate(steps):
            if t in starts_at or st[0] != prev:
                if t in starts_at:
                    rstarts[starts_at[t]] = len(r_op)
                r_op.append(op_id[st[0]])
                r_s0.append(t)
                prev = st[0]
        r_s0.append(len(steps))
        rstarts[-1] = len(r_op)
        if not r_op:
            r_op, r_s0 = [0], [0, 0]
        self.r_op = np.asarray(r_op, np.int32)
        self.r_s0 = np.asarray(r_s0, np.int32)
        self.rstarts = np.asarray(rstarts, np.int32)
        self.n_runs = len(r_op)
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
        self.call_runs = max((int(rstarts[b]) - int(rstarts[a]))
                             for (a, b, _s, _t) in calls)
        # const bank (scalar-prefetched, int32)
        if not bank_vals:
            bank_vals.append(0)
        cb = np.zeros((len(bank_vals), L), np.int32)
        for r, v in enumerate(bank_vals):
            cb[r] = int_to_limbs(v, L).astype(np.int32)
        self.cbank = cb
        # witness source map (everything is an emission row by
        # construction — the passthrough-copy pass above; const/input
        # fallbacks retained for the zero-step tape edge case)
        self.wit_src = []
        for nid in self.xt.out_ids:
            if nid in bit_src:
                w, p = bit_src[nid]
                self.wit_src.append(("emitb", *wit_rows_n[w], p))
            elif nid in wit_rows_n:
                self.wit_src.append(("emitn", *wit_rows_n[nid]))
            elif nid in defer_src:
                # deferred conversion: the producer's row IS canonical
                # after the kernel's trailing REDC slab
                self.wit_src.append(("emit", *wit_rows[defer_src[nid]]))
            elif nid in wit_rows:
                self.wit_src.append(("emit", *wit_rows[nid]))
            elif xt.kind[nid] == "const":
                self.wit_src.append(("const", xt.cval[nid]))
            else:
                self.wit_src.append(("input", xt.iidx[nid]))

    # ------------------------------------------------------------------
    def _schedule_runs(self, steps):
        """Reorder steps into same-opcode RUNS (greedy list schedule).

        The kernel dispatches one lax.switch per run (not per step), so
        long runs amortize interpreter dispatch — bit-parallel circuits
        (SHA: 32 independent per-bit ops per word op) produce wide
        ready sets.  Greedy rule: among ready steps, emit the whole
        ready set of the opcode that currently has the most ready
        steps; newly-readied steps of the same opcode extend the run
        (runs are recomputed from the final order).  Always a valid
        topological order."""
        n = len(steps)
        if n == 0:
            return steps
        kind = self.xt.kind
        prod = {}
        for t, st in enumerate(steps):
            if kind[st[4]] == "compute":
                prod[st[4]] = t
        consumers = [[] for _ in range(n)]
        indeg = [0] * n
        for t, st in enumerate(steps):
            seen = set()
            for x in st[1:4]:
                if isinstance(x, int) and x in prod and prod[x] != t \
                        and prod[x] not in seen:
                    seen.add(prod[x])
                    consumers[prod[x]].append(t)
                    indeg[t] += 1
        # ALAP levels: how late each step may run.  Emission-only steps
        # pin right after their producers (not the tape end — keeping
        # their operands live to the end would blow the register file).
        alap = [0] * n
        for t in range(n - 1, -1, -1):
            if consumers[t]:
                alap[t] = min(alap[t2] for t2 in consumers[t]) - 1
        for t in range(n):
            if not consumers[t]:
                lv = None
                for x in steps[t][1:4]:
                    if isinstance(x, int) and x in prod:
                        lx = alap[prod[x]]
                        lv = lx if lv is None else max(lv, lx)
                alap[t] = 0 if lv is None else lv + 1
        # list schedule: always serve the most-urgent opcode class, and
        # take every ready step of that opcode within an ALAP horizon —
        # long same-op runs without letting far-future work (e.g. SHA
        # weight products for rounds 7-16 ahead) stretch liveness.
        import heapq
        HORIZON = 4
        heaps = {}
        for t in range(n):
            if indeg[t] == 0:
                heaps.setdefault(steps[t][0], []).append((alap[t], t))
        for h in heaps.values():
            heapq.heapify(h)
        order = []
        while heaps:
            op = min(heaps, key=lambda o: heaps[o][0])
            h = heaps[op]
            lim = h[0][0] + HORIZON
            batch = []
            while h and h[0][0] < lim:
                batch.append(heapq.heappop(h)[1])
            if not h:
                del heaps[op]
            batch.sort()
            order.extend(batch)
            for t in batch:
                for t2 in consumers[t]:
                    indeg[t2] -= 1
                    if indeg[t2] == 0:
                        h2 = heaps.get(steps[t2][0])
                        if h2 is None:
                            h2 = heaps[steps[t2][0]] = []
                        heapq.heappush(h2, (alap[t2], t2))
        return [steps[t] for t in order]

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
        nmat_loads = self.nmat_loads
        opset_n, opset_w = self.opset_n, self.opset_w
        N_N = self.n_narrow_ops
        p = self.xt.p
        q_limbs = [int(x) for x in int_to_limbs(p - (1 << 32), L)]

        n_win, n_nin = self.n_win, self.n_nin
        handoff = len(self.calls) > 1
        hbm_nin = self.hbm_nin
        n_cc = self.call_chunks

        def kernel(rstarts_ref, ropc_ref, rs0_ref, ia_ref, ib_ref,
                   ic_ref, dst_ref, em_ref, aux_ref, cb_ref, mont_ref,
                   in_ref, inn_ref, *rest):
            if handoff:
                (rfw_in, rfn_in, out_ref, out_n_ref, rfw_out, rfn_out,
                 rf, rf_n, sem) = rest
            elif hbm_nin:
                out_ref, out_n_ref, rf, rf_n, sem = rest
            else:
                out_ref, out_n_ref, rf, rf_n = rest
            g = pl.program_id(0)
            c = pl.program_id(1)
            zero = jnp.zeros((8, bb), jnp.uint32)

            @pl.when(c == 0)
            def _():
                if handoff:
                    # restore the register files from the previous call
                    # (batch-block-major HBM layout: .at[g] slices are
                    # contiguous, one DMA descriptor per file)
                    cp = pltpu.make_async_copy(rfw_in.at[g], rf,
                                               sem.at[0])
                    cp.start()
                    cp2 = pltpu.make_async_copy(rfn_in.at[g], rf_n,
                                                sem.at[1])
                    cp2.start()
                    cp.wait()
                    cp2.wait()
                for k in range(n_win):
                    for i in range(L):
                        rf[k, i] = in_ref[0, k, i]
                if hbm_nin:
                    # narrow inputs live in HBM pre-sliced per batch
                    # block; DMA them straight into their rf_n slots
                    cpi = pltpu.make_async_copy(
                        inn_ref.at[g], rf_n.at[pl.ds(0, n_nin)],
                        sem.at[0])
                    cpi.start()
                    cpi.wait()
                else:
                    for k in range(n_nin):
                        rf_n[k] = inn_ref[0, k]
                for (reg, limbs) in mat_loads:
                    for i in range(L):
                        rf[reg, i] = jnp.full((8, bb), np.uint32(limbs[i]),
                                              jnp.uint32)
                for (reg, sv) in nmat_loads:
                    rf_n[reg] = jnp.full((8, bb), np.int32(sv), jnp.int32)

            def exec_step(t, op):
                ia = ia_ref[t]
                ib = ib_ref[t]
                ic = ic_ref[t]
                aux = aux_ref[t]
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

                def idiv_rows():
                    # limb-level binary long division over the
                    # canonical operands: BITS fori_loop iterations of
                    # shift-in / compare / predicated subtract.  The
                    # bit shifted out of the top limb ("topbit") forces
                    # the subtract; the wraparound difference mod
                    # 2^(16L) is then exact (see jfield.idiv).
                    # idiv(a, 0) = 0 (backend/dynops.py contract).
                    BITS = p.bit_length()
                    av = [jnp.broadcast_to(rf[ia, i2], (8, bb))
                          for i2 in range(L)]
                    bv = [jnp.broadcast_to(rf[ib, i2], (8, bb))
                          for i2 in range(L)]
                    nzb = bv[0]
                    for j in range(1, L):
                        nzb = nzb | bv[j]
                    a_s = jnp.stack(av)
                    b_s = jnp.stack(bv)

                    def body(t, carry):
                        R, Q = carry
                        i2 = BITS - 1 - t
                        li = i2 // LIMB_BITS
                        sh = (i2 % LIMB_BITS).astype(jnp.uint32)
                        la = zero
                        for j in range(L):
                            la = jnp.where(li == j, a_s[j], la)
                        bit = (la >> sh) & 1
                        topbit = R[L - 1] >> (LIMB_BITS - 1)
                        rws = [((R[0] << 1) & MASK) | bit]
                        for j in range(1, L):
                            rws.append(((R[j] << 1) & MASK)
                                       | (R[j - 1] >> (LIMB_BITS - 1)))
                        borrow = jnp.zeros((8, bb), jnp.int32)
                        subs = []
                        for j in range(L):
                            v = rws[j].astype(jnp.int32) \
                                - b_s[j].astype(jnp.int32) - borrow
                            subs.append((v & MASK).astype(jnp.uint32))
                            borrow = -(v >> LIMB_BITS)
                        ge = (topbit != 0) | (borrow == 0)
                        Rn = jnp.stack([jnp.where(ge, subs[j], rws[j])
                                        for j in range(L)])
                        qbit = jnp.where(ge, jnp.uint32(1) << sh,
                                         jnp.uint32(0))
                        Qn = jnp.stack(
                            [jnp.where(li == j, Q[j] | qbit, Q[j])
                             for j in range(L)])
                        return Rn, Qn

                    z3 = jnp.zeros((L, 8, bb), jnp.uint32)
                    _, q3 = lax.fori_loop(0, BITS, body, (z3, z3))
                    return [jnp.where(nzb == 0, zero, q3[j])
                            for j in range(L)]

                def wbranch(op):
                    if op == "copyw":
                        rows = [rf[ia, i2] for i2 in range(L)]
                    elif op == "widen":
                        rows = widen_rows()
                    elif op == "idiv":
                        rows = idiv_rows()
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
                    elif op == "gmul":
                        rows = em.gl_mul(rd_vv, zero)
                    elif op == "gmul_c":
                        rows = em.gl_mul(rd_bank, zero)
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
                    if op == "ncopy":
                        return na
                    if op == "nmul":
                        return na * rf_n[ib]
                    if op == "nadd":
                        return na + rf_n[ib]
                    if op == "nsub":
                        return na - rf_n[ib]
                    if op == "nsel":
                        return jnp.where(na != 0, rf_n[ib], rf_n[ic])
                    if op == "nidiv":
                        nb = rf_n[ib]
                        return jnp.where(nb == 0, 0,
                                         na // jnp.where(nb == 0, 1, nb))
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
                    if op == "nshru":
                        # logical shift: packed words use all 32 bits
                        return (na.astype(jnp.uint32)
                                >> aux.astype(jnp.uint32)) \
                            .astype(jnp.int32)
                    if op == "nxbit":
                        # fused bit extract: (a >>u aux) & 1
                        return ((na.astype(jnp.uint32)
                                 >> aux.astype(jnp.uint32))
                                & 1).astype(jnp.int32)
                    if op == "nmshl":
                        # fused mask+shift: (a & b) << aux
                        return (na & rf_n[ib]) << aux
                    if op == "nmshru":
                        # fused mask+logical shift: (a & b) >>u aux
                        return ((na & rf_n[ib]).astype(jnp.uint32)
                                >> aux.astype(jnp.uint32)) \
                            .astype(jnp.int32)
                    if op == "nrotr":
                        # fused 32-bit rotate right by aux
                        ua = na.astype(jnp.uint32)
                        r = aux.astype(jnp.uint32)
                        return ((ua >> r)
                                | (ua << (np.uint32(32) - r))) \
                            .astype(jnp.int32)
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

                if "nostep" in _ABLATE:
                    return
                if op in _NARROW_RESULT:
                    res = nbranch(op)
                    if "nowrite" not in _ABLATE:
                        rf_n[dst] = res
                    if "noemit" not in _ABLATE:
                        out_n_ref[0, em_ref[t]] = res
                else:
                    res = wbranch(op)
                    if "nowrite" not in _ABLATE:
                        rf[dst] = res
                    if "noemit" not in _ABLATE:
                        out_ref[0, em_ref[t]] = res

            # one switch per same-opcode RUN; the op is static inside
            # each branch's step loop (dispatch amortized over the run)
            def run_body(rr, carry):
                opc = ropc_ref[rr]
                s0 = rs0_ref[rr]
                s1 = rs0_ref[rr + 1]

                def stepper(op):
                    def stp(t, cy):
                        exec_step(t, op)
                        return cy

                    def go():
                        return lax.fori_loop(s0, s1, stp, 0)
                    return go

                if N_N and opset_w:
                    @pl.when(opc < N_N)
                    def _():
                        lax.switch(opc, [stepper(op) for op in opset_n])

                    @pl.when(opc >= N_N)
                    def _():
                        lax.switch(opc - N_N,
                                   [stepper(op) for op in opset_w])
                elif opset_w:
                    lax.switch(opc - N_N,
                               [stepper(op) for op in opset_w])
                else:
                    lax.switch(opc, [stepper(op) for op in opset_n])
                return carry

            if "noloop" not in _ABLATE:
                lax.fori_loop(rstarts_ref[c], rstarts_ref[c + 1],
                              run_body, 0)

            if self.mont_any and "noredc" not in _ABLATE:
                # trailing REDC pass: convert this chunk's flagged
                # Montgomery emission rows to canonical in place
                # (montmul(x, 1) == REDC(x)), row-by-row gated by the
                # prefetched mont table — replaces one interpreted
                # mul_one step per witness value (deferred from-Mont
                # pass in _plan): no switch dispatch, no operand
                # tables, static limb addressing within the row.
                def redc_row(r, carry):
                    @pl.when(mont_ref[c * (K + 1) + r] != 0)
                    def _():
                        rows = [out_ref[0, r, i] for i in range(L)]
                        red = em.mont_reduce_rows(rows, zero)
                        for i in range(L):
                            out_ref[0, r, i] = red[i]
                    return carry

                lax.fori_loop(0, K + 1, redc_row, 0)

            if handoff:
                @pl.when(c == n_cc - 1)
                def _():
                    cp = pltpu.make_async_copy(rf, rfw_out.at[g],
                                               sem.at[0])
                    cp.start()
                    cp2 = pltpu.make_async_copy(rf_n, rfn_out.at[g],
                                                sem.at[1])
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

        interp = (not on_tpu()) \
            if self.interpret is None else self.interpret
        if self.n_steps:
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
                flat = jnp.concatenate([p[0] for p in parts_b], axis=0)
                flat_n = jnp.concatenate([p[1] for p in parts_b],
                                         axis=0)
            else:
                flat, flat_n = self._exec_block(x_w, x_n, B8, bb, interp)
            bb_g = flat.shape[-1]
        else:
            bb_g = B8
            flat = jnp.zeros((1, 1, L, 8, B8), jnp.uint32)
            flat_n = jnp.zeros((1, 1, 8, B8), jnp.int32)
        G = B8 // bb_g

        # gather emissions/inputs/consts into witness order (all banks
        # in the batch-block-major layout; the final gather un-blocks)
        const_rows = []
        const_pos = {}
        idx = []
        n_flat = flat.shape[1]
        KN = self.KN
        if self.n_steps and len(self.calls) > 1:
            CC = self.call_chunks
            chunk_base, chunk_base_n = [], []
            for ci, (a, b, _s0, _s1) in enumerate(self.calls):
                for g in range(a, b):
                    chunk_base.append(ci * CC * (K + 1)
                                      + (g - a) * (K + 1))
                    chunk_base_n.append(ci * CC * (KN + 1)
                                        + (g - a) * (KN + 1))
        elif self.n_steps:
            chunk_base = [g * (K + 1) for g in range(self.n_chunks)]
            chunk_base_n = [g * (KN + 1) for g in range(self.n_chunks)]
        else:
            chunk_base = chunk_base_n = []
        # narrow emissions used by the witness convert to limb rows in
        # ONE vectorized pass (the kernel never widens for emission)
        idx_n, sh_n = [], []
        pos_n = {}
        for src in self.wit_src:
            if src[0] in ("emitn", "emitb"):
                key = (src[1], src[2], src[3] if src[0] == "emitb"
                       else -1)
                if key not in pos_n:
                    pos_n[key] = len(idx_n)
                    idx_n.append(chunk_base_n[src[1]] + src[2])
                    sh_n.append(key[2])
        n_in_bank = n_in_prog
        n_const0 = n_flat + n_in_bank
        for src in self.wit_src:
            if src[0] == "emit":
                idx.append(chunk_base[src[1]] + src[2])
            elif src[0] in ("emitn", "emitb"):
                idx.append(0)  # patched below once n_const is known
            elif src[0] == "input":
                idx.append(n_flat + src[1])
            else:
                v = src[1]
                if v not in const_pos:
                    const_pos[v] = len(const_rows)
                    const_rows.append(np.asarray(int_to_limbs(v, L)))
                idx.append(n_const0 + const_pos[v])
        n_const = len(const_rows)
        for w_i, src in enumerate(self.wit_src):
            if src[0] in ("emitn", "emitb"):
                key = (src[1], src[2], src[3] if src[0] == "emitb"
                       else -1)
                idx[w_i] = n_const0 + n_const + pos_n[key]
        if self.n_steps and not interp and self.pl_gather \
                and "noplgather" not in _ABLATE \
                and not idx_n and not const_rows \
                and all(s[0] == "emit" for s in self.wit_src):
            # fast path: one Pallas gather+un-block pass over the
            # emission bank (everything is an emission row by plan
            # construction)
            wit = self._unblock_gather_w(flat, idx)
            if self.raw_out and Bp == B:
                # (W, L, 8, G, bb): byte-identical to (W, L, B) —
                # the device-side reshape would RETILE to T(8,128)
                # over (W, B) (pad + physical transpose, 2 full HBM
                # passes, ~21 ms on SHA-32k); raw consumers reshape
                # the fetched bytes for free on the host
                return wit
            return wit.reshape(len(idx), L, Bp)[..., :B]
        # general path (CPU/interpret, or narrow rows widened into the
        # wide witness): un-block the banks, then XLA gather
        flat_u = jnp.moveaxis(flat, 0, 3).reshape(n_flat, L, 8, B8)
        flat_n_u = jnp.moveaxis(flat_n, 0, 2).reshape(
            flat_n.shape[1], 8, B8)
        banks = [flat_u, x]
        if const_rows:
            cb = jnp.broadcast_to(
                jnp.asarray(np.stack(const_rows))[:, :, None, None],
                (n_const, L, 8, B8))
            banks.append(cb)
        else:
            banks.append(jnp.zeros((0, L, 8, B8), jnp.uint32))
        if idx_n:
            sel_n = jnp.take(flat_n_u, jnp.asarray(idx_n, np.int32),
                             axis=0)
            banks.append(self._widen_narrow(_unpack_bits(sel_n, sh_n)))
        big = jnp.concatenate(banks, axis=0)
        wit = jnp.take(big, jnp.asarray(idx, np.int32), axis=0)
        return wit.reshape(len(idx), L, Bp)[..., :B]

    def _run_mixed(self, inputs):
        """uint32 (n_inputs, L, B) -> witness in MIXED representation.

        Returns (narrow int32 (n_nw, B), wide uint32 (n_wd, L, B));
        row order is given by self.mixed_layout() (narrow_idx, wide_idx
        witness positions).  Bit-class witnesses stay as one int32 per
        value — the SHA256 witness at batch 64k would be >100GB in limb
        form, 7GB mixed.  The reference's emitted runtimes hold the
        full witness in signal memory the same way before .wtns export
        (code_producers/src/wasm_elements/common/witness_calculator.js
        :264-271); `_widen_narrow` is the format conversion."""
        L = self.L
        n_in_prog = max(self.n_inputs, 1)
        _n, Lin, B = inputs.shape
        bb = self.lanes
        unit = 8 * bb if (B >= 8 * bb or bb < 128) else 8
        Bp = -(-B // unit) * unit
        if Bp != B:
            inputs = jnp.pad(inputs, ((0, 0), (0, 0), (0, Bp - B)))
        B8 = Bp // 8
        bb = min(bb, B8)
        # Lin may be < self.L for an all-narrow input set (SHA-class):
        # only limbs 0-1 feed the narrow lane, so callers can pass a
        # (n, 2, B) input and skip 8x of dead transfer/HBM
        x = inputs.reshape(n_in_prog, Lin, 8, B8) if self.n_inputs \
            else jnp.zeros((1, L, 8, B8), jnp.uint32)
        order_w = sorted(self.win_of, key=self.win_of.get)
        order_n = sorted(self.nin_of, key=self.nin_of.get)
        if order_w:
            assert Lin == L, "wide inputs need full-limb input rows"
            x_w = x[np.asarray(order_w)]
        else:
            x_w = jnp.zeros((1, L, 8, B8), jnp.uint32)
        if order_n:
            xs = x[np.asarray(order_n)]
            x_n = xs[:, 0].astype(jnp.int32)
            if Lin > 1:
                x_n = x_n | (xs[:, 1].astype(jnp.int32) << LIMB_BITS)
        else:
            x_n = jnp.zeros((1, 8, B8), jnp.int32)
        interp = (not on_tpu()) \
            if self.interpret is None else self.interpret
        if self.n_steps:
            flat, flat_n = self._exec_block(x_w, x_n, B8, bb, interp)
        else:
            flat = jnp.zeros((1, 1, L, 8, B8), jnp.uint32)
            flat_n = jnp.zeros((1, 1, 8, B8), jnp.int32)
        (nw_src, nw_shift, wd_src), _ = self._mixed_split()
        n_fw, n_fn = flat.shape[1], flat_n.shape[1]
        fast = self.n_steps and not interp and self.pl_gather \
            and "noplgather" not in _ABLATE
        if nw_src:
            if fast and all(s < n_fn for s in nw_src):
                narrow = self._unblock_gather_n(flat_n, nw_src,
                                                nw_shift)
                if not (self.raw_out and Bp == B):
                    # see _run: the reshape retiles (2 HBM passes)
                    narrow = narrow.reshape(len(nw_src), Bp)[:, :B]
            else:
                fn_u = jnp.moveaxis(flat_n, 0, 2).reshape(n_fn, 8, B8)
                narrow = jnp.take(
                    jnp.concatenate([fn_u, x_n], axis=0),
                    jnp.asarray(nw_src, np.int32), axis=0)
                narrow = _unpack_bits(narrow, nw_shift)
                narrow = narrow.reshape(len(nw_src), Bp)[:, :B]
        else:
            narrow = jnp.zeros((0, B), jnp.int32)
        if wd_src:
            if fast and all(s < n_fw for s in wd_src):
                wide = self._unblock_gather_w(flat, wd_src)
                wide = wide.reshape(len(wd_src), L, Bp)[..., :B]
            else:
                const_rows = [np.asarray(int_to_limbs(v, L))
                              for v in self._mixed_consts]
                fl_u = jnp.moveaxis(flat, 0, 3).reshape(n_fw, L, 8, B8)
                banks = [fl_u, x_w]
                if const_rows:
                    banks.append(jnp.broadcast_to(
                        jnp.asarray(np.stack(const_rows))[:, :, None,
                                                          None],
                        (len(const_rows), L, 8, B8)))
                wide = jnp.take(jnp.concatenate(banks, axis=0),
                                jnp.asarray(wd_src, np.int32), axis=0)
                wide = wide.reshape(len(wd_src), L, Bp)[..., :B]
        else:
            wide = jnp.zeros((0, L, B), jnp.uint32)
        return (narrow, wide)

    def _mixed_split(self):
        """Classify wit_src into (narrow bank rows, wide bank rows) and
        the witness indices each covers.  Cached."""
        hit = getattr(self, "_mixed_cache", None)
        if hit is not None:
            return hit
        K, KN = self.K, self.KN
        if self.n_steps and len(self.calls) > 1:
            CC = self.call_chunks
            cb_w, cb_n = [], []
            for ci, (a, b, _s0, _s1) in enumerate(self.calls):
                for g in range(a, b):
                    cb_w.append(ci * CC * (K + 1) + (g - a) * (K + 1))
                    cb_n.append(ci * CC * (KN + 1) + (g - a) * (KN + 1))
        elif self.n_steps:
            cb_w = [g * (K + 1) for g in range(self.n_chunks)]
            cb_n = [g * (KN + 1) for g in range(self.n_chunks)]
        else:
            cb_w = cb_n = []
        n_flat_w = (len(cb_w) * (K + 1)) if cb_w else 1
        n_flat_n = (len(cb_n) * (KN + 1)) if cb_n else 1
        nw_src, wd_src, nw_idx, wd_idx = [], [], [], []
        nw_shift = []   # per narrow row: -1 raw, else unpack bit index
        consts = []
        const_pos = {}
        for w_i, src in enumerate(self.wit_src):
            if src[0] == "emitb":
                nw_src.append(cb_n[src[1]] + src[2])
                nw_shift.append(src[3])
                nw_idx.append(w_i)
            elif src[0] == "emitn":
                nw_src.append(cb_n[src[1]] + src[2])
                nw_shift.append(-1)
                nw_idx.append(w_i)
            elif src[0] == "emit":
                wd_src.append(cb_w[src[1]] + src[2])
                wd_idx.append(w_i)
            elif src[0] == "input":
                if src[1] in self.nin_of:
                    nw_src.append(n_flat_n + self.nin_of[src[1]])
                    nw_idx.append(w_i)
                else:
                    wd_src.append(n_flat_w + self.win_of[src[1]])
                    wd_idx.append(w_i)
            else:
                v = src[1]
                if v not in const_pos:
                    const_pos[v] = len(consts)
                    consts.append(v)
                wd_src.append(n_flat_w + max(len(self.win_of), 1)
                              + const_pos[v])
                wd_idx.append(w_i)
        self._mixed_consts = consts
        self._mixed_cache = ((nw_src, nw_shift, wd_src),
                             (nw_idx, wd_idx))
        return self._mixed_cache

    def mixed_layout(self):
        """(narrow witness indices, wide witness indices) matching the
        row order of run_mixed's two arrays."""
        _, idx = self._mixed_split()
        return idx

    def run_mixed(self, inputs):
        if getattr(self, "_jit_mixed", None) is None:
            self._jit_mixed = jax.jit(self._run_mixed)
        return self._jit_mixed(inputs)

    def _widen_narrow(self, v):
        """Signed int32 (N, 8, B8) -> canonical limb rows (N, L, 8, B8)
        uint32 (mirrors the kernel's `widen` with one vectorized pass:
        v >= 0 -> [v & m, v >> 16, 0...]; v < 0 -> (p - 2^32) + uint32(v)
        with a static carry chain)."""
        L = self.L
        q_limbs = [int(x) for x in
                   int_to_limbs(self.xt.p - (1 << 32), L)]
        u = v.astype(jnp.uint32)
        lo = u & MASK
        hi = (u >> LIMB_BITS) & MASK
        neg = v < 0
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
        zero = jnp.zeros_like(lo)
        rpos = [lo, hi] + [zero] * (L - 2)
        rows = [jnp.where(neg, rneg[i], rpos[i]) for i in range(L)]
        return jnp.stack(rows, axis=-3)

    def _exec_block(self, x_w, x_n, B8, bb, interp):
        """Run the interpreter kernel(s) on one batch group; returns
        (wide emissions (G, rows, L, 8, bb) uint32,
         narrow emissions (G, rows_n, 8, bb) int32), G = B8 // bb.

        Everything the grid streams is laid out batch-block-major so
        every Pallas block is CONTIGUOUS in HBM: the (1, K+1, L, 8, bb)
        emission window of the old (chunks, K+1, L, 8, B8) layout was
        K·L·8 separate 4·bb-byte strided segments, and the per-segment
        DMA descriptor cost (~20 ns each, measured) dominated the whole
        kernel (~80 us/grid-cell on Poseidon2 — 25 of 47 ms with the
        interpreter loop ablated to empty)."""
        L = self.L
        K = self.K
        KN = self.KN
        t = self.table
        n_win_b = max(self.n_win, 1)
        n_nin_b = max(self.n_nin, 1)
        G = B8 // bb
        # pre-block inputs: (G, n, ..., bb) so each grid block reads one
        # contiguous slab
        x_w = jnp.moveaxis(x_w.reshape(n_win_b, L, 8, G, bb), 3, 0)
        x_n = jnp.moveaxis(x_n.reshape(n_nin_b, 8, G, bb), 2, 0)
        if self.hbm_nin:
            # narrow inputs stay in HBM and DMA straight into rf_n
            inn_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        else:
            inn_spec = pl.BlockSpec((1, n_nin_b, 8, bb),
                                    lambda g, c, *_: (g, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
        in_spec = pl.BlockSpec((1, n_win_b, L, 8, bb),
                               lambda g, c, *_: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        if len(self.calls) == 1:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                # 1D tables only: SMEM pads the minor dim to 128
                # lanes, so a (n,6) table costs 512B/row (measured
                # OOM at 1879 steps); 1D arrays cost 4B/step.
                num_scalar_prefetch=11,
                grid=(G, self.n_chunks),
                in_specs=[in_spec, inn_spec],
                out_specs=(pl.BlockSpec(
                               (1, K + 1, L, 8, bb),
                               lambda g, c, *_:
                               (g * self.n_chunks + c, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                           pl.BlockSpec(
                               (1, KN + 1, 8, bb),
                               lambda g, c, *_:
                               (g * self.n_chunks + c, 0, 0, 0),
                               memory_space=pltpu.VMEM)),
                scratch_shapes=[
                    pltpu.VMEM((self.n_regs, L, 8, bb), jnp.uint32),
                    pltpu.VMEM((max(self.n_nregs, 1), 8, bb),
                               jnp.int32)]
                + ([pltpu.SemaphoreType.DMA((1,))] if self.hbm_nin
                   else []),
            )
            emits, emits_n = pl.pallas_call(
                self._make_kernel(bb),
                out_shape=(
                    jax.ShapeDtypeStruct(
                        (G * self.n_chunks, K + 1, L, 8, bb),
                        jnp.uint32),
                    jax.ShapeDtypeStruct(
                        (G * self.n_chunks, KN + 1, 8, bb),
                        jnp.int32)),
                grid_spec=grid_spec,
                interpret=interp,
            )(self.rstarts, self.r_op, self.r_s0,
              np.ascontiguousarray(t[:, 1]),
              np.ascontiguousarray(t[:, 2]),
              np.ascontiguousarray(t[:, 3]),
              np.ascontiguousarray(t[:, 4]),
              np.ascontiguousarray(t[:, 5]),
              np.ascontiguousarray(t[:, 6]),
              self.cbank.reshape(-1), self.mont_tab, x_w, x_n)
            return (emits.reshape(G, self.n_chunks * (K + 1), L, 8, bb),
                    emits_n.reshape(G, self.n_chunks * (KN + 1), 8, bb))
        # multi-call paging: each call interprets a table slice
        # (padded to one shared shape = one Mosaic kernel) and
        # the register files ride through HBM between calls
        # (batch-block-major, so the handoff DMAs are contiguous)
        CS, CC = self.call_steps, self.call_chunks
        CR = self.call_runs
        kernel = self._make_kernel(bb)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(G, CC),
            in_specs=[in_spec, inn_spec,
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=(pl.BlockSpec((1, K + 1, L, 8, bb),
                                    lambda g, c, *_:
                                    (g * CC + c, 0, 0, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, KN + 1, 8, bb),
                                    lambda g, c, *_:
                                    (g * CC + c, 0, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                       pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)),
            scratch_shapes=[
                pltpu.VMEM((self.n_regs, L, 8, bb), jnp.uint32),
                pltpu.VMEM((max(self.n_nregs, 1), 8, bb),
                           jnp.int32),
                pltpu.SemaphoreType.DMA((2,))],
        )
        rf_w = jnp.zeros((G, self.n_regs, L, 8, bb), jnp.uint32)
        rf_nn = jnp.zeros((G, max(self.n_nregs, 1), 8, bb),
                          jnp.int32)
        parts, parts_n = [], []
        for (a, b, s0, s1) in self.calls:
            tb = np.zeros((CS, 7), np.int32)
            tb[:s1 - s0] = t[s0:s1]
            r0, r1 = int(self.rstarts[a]), int(self.rstarts[b])
            ropc = np.zeros(CR, np.int32)
            ropc[:r1 - r0] = self.r_op[r0:r1]
            rs0 = np.empty(CR + 1, np.int32)
            rseg = self.r_s0[r0:r1 + 1] - s0
            rs0[:len(rseg)] = rseg
            rs0[len(rseg):] = rseg[-1]
            rst = np.empty(CC + 1, np.int32)
            seg = self.rstarts[a:b + 1] - r0
            rst[:len(seg)] = seg
            rst[len(seg):] = seg[-1]
            mont_call = np.zeros((CC * (K + 1),), np.int32)
            mont_call[:(b - a) * (K + 1)] = \
                self.mont_tab[a * (K + 1):b * (K + 1)]
            emits_i, emits_ni, rf_w, rf_nn = pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct(
                        (G * CC, K + 1, L, 8, bb), jnp.uint32),
                    jax.ShapeDtypeStruct(
                        (G * CC, KN + 1, 8, bb), jnp.int32),
                    jax.ShapeDtypeStruct(rf_w.shape, jnp.uint32),
                    jax.ShapeDtypeStruct(rf_nn.shape, jnp.int32)),
                grid_spec=grid_spec,
                interpret=interp,
            )(rst, ropc, rs0,
              np.ascontiguousarray(tb[:, 1]),
              np.ascontiguousarray(tb[:, 2]),
              np.ascontiguousarray(tb[:, 3]),
              np.ascontiguousarray(tb[:, 4]),
              np.ascontiguousarray(tb[:, 5]),
              np.ascontiguousarray(tb[:, 6]),
              self.cbank.reshape(-1), mont_call,
              x_w, x_n, rf_w, rf_nn)
            parts.append(emits_i.reshape(G, CC * (K + 1), L, 8, bb))
            parts_n.append(emits_ni.reshape(G, CC * (KN + 1), 8, bb))
        return (jnp.concatenate(parts, axis=1),
                jnp.concatenate(parts_n, axis=1))


    def _unblock_gather_w(self, bank, idx):
        """Witness gather + un-blocking in ONE Pallas pass.

        bank (G, R, L, 8, bb) -> (W, L, 8, G, bb): cell (w, h) DMAs the
        contiguous (G, 1, Lh, 8, bb) slab of bank row idx[w] in and
        writes the transposed (1, Lh, 8, G, bb) output block, which is
        contiguous in the destination.  XLA's own gather on the blocked
        bank lowers to per-slice copies (~2.6 us each, 25 ms on
        Poseidon2-64k vs ~4 ms here); an unblocked bank would need a
        (G -> minor) relayout pass first (~15 ms measured)."""
        G, _R, L, _s, bb = bank.shape
        W = len(idx)
        Lh = L
        while Lh > 1 and Lh * 8 * G * bb * 4 > (2 << 20):
            Lh //= 2

        def kern(_idx_ref, in_ref, out_ref):
            for g in range(G):
                out_ref[0, :, :, g, :] = in_ref[g, 0]

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((W, L, 8, G, bb), bank.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(W, L // Lh),
                in_specs=[pl.BlockSpec(
                    (G, 1, Lh, 8, bb),
                    lambda w, h, i: (0, i[w], h, 0, 0),
                    memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (1, Lh, 8, G, bb),
                    lambda w, h, i: (w, h, 0, 0, 0),
                    memory_space=pltpu.VMEM),
            ),
        )(jnp.asarray(idx, jnp.int32), bank)

    def _unblock_gather_n(self, bank, idx, shifts=None):
        """Narrow variant: (G, R, 8, bb) int32 -> (W, 8, G, bb).

        shifts[w] >= 0 unpacks one bit from a packed word row
        ((row >> shift) & 1, bitpack.py emission) during the same
        DMA-bound pass; -1 copies the row raw.

        Unlike the wide gather, W here can be tens of thousands of
        rows (every bit of a packed circuit is a witness value), so a
        one-row-per-grid-cell design pays ~2.7 us of per-cell overhead
        ~W times.  Instead: relayout the (now word-packed, so small)
        bank row-major once, then each grid cell gathers RC rows with
        pipelined in-kernel DMAs and unpacks them in VMEM."""
        G, _R, _s, bb = bank.shape
        W = len(idx)
        RC = 32
        Wp = -(-W // RC) * RC
        idx_p = np.zeros(Wp, np.int32)
        idx_p[:W] = np.asarray(idx, np.int32)
        sh_p = np.full(Wp, -1, np.int32)
        if shifts is not None:
            sh_p[:W] = np.asarray(shifts, np.int32)
        # per-cell dedup: witness bit rows come in long single-word
        # runs, so each 32-row cell touches very few distinct bank
        # rows.  DMA exactly U distinct rows per cell (duplicate-padded)
        # and route each output row to its scratch slot.
        n_cells = Wp // RC
        maxu = 1
        cell_uniq, cell_map = [], np.zeros(Wp, np.int32)
        for c in range(n_cells):
            seen = {}
            for j in range(RC):
                r = int(idx_p[c * RC + j])
                if r not in seen:
                    seen[r] = len(seen)
                cell_map[c * RC + j] = seen[r]
            maxu = max(maxu, len(seen))
            cell_uniq.append(list(seen))
        U = max(2, maxu)
        uniq_p = np.zeros((n_cells, U), np.int32)
        cnt_p = np.zeros(n_cells, np.int32)
        for c, rows in enumerate(cell_uniq):
            uniq_p[c, :len(rows)] = rows
            uniq_p[c, len(rows):] = rows[0] if rows else 0
            cnt_p[c] = max(1, len(rows))

        def kern(uniq_ref, cnt_ref, jm_ref, sh_ref, bank_ref, out_ref,
                 scratch, tr, sem):
            c = pl.program_id(0)
            cnt = cnt_ref[c]
            # each row slab bank[:, r] is G strided 8*bb segments —
            # one DMA descriptor set per distinct row, no relayout
            # pass.  DMAs and un-block copies are PREDICATED on the
            # cell's own distinct-row count: witness rows come in long
            # single-word runs, so most cells touch 2-3 rows, but ~30
            # scattered boundary cells force U=32 — a global U makes
            # EVERY cell pay 32 row DMAs (27k instead of ~2.9k on
            # SHA256, the dominant gather cost)
            for u in range(U):
                @pl.when(u < cnt)
                def _():
                    pltpu.make_async_copy(
                        bank_ref.at[:, uniq_ref[c, u]],
                        scratch.at[u], sem.at[u]).start()
            for u in range(U):
                @pl.when(u < cnt)
                def _():
                    pltpu.make_async_copy(
                        bank_ref.at[:, uniq_ref[c, u]],
                        scratch.at[u], sem.at[u]).wait()
            # un-block the distinct rows once (cnt*G small copies),
            # then each output row is ONE whole-slab select
            for u in range(U):
                @pl.when(u < cnt)
                def _():
                    for g in range(G):
                        tr[u, :, g, :] = scratch[u, g]
            for j in range(RC):
                s = sh_ref[c * RC + j]
                su = jnp.maximum(s, 0).astype(jnp.uint32)
                v = tr[jm_ref[c * RC + j]]
                b = ((v.astype(jnp.uint32) >> su) & 1) \
                    .astype(jnp.int32)
                out_ref[j] = jnp.where(s < 0, v, b)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((W, 8, G, bb), bank.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(n_cells,),
                in_specs=[pl.BlockSpec(
                    memory_space=pltpu.MemorySpace.ANY)],
                out_specs=pl.BlockSpec(
                    (RC, 8, G, bb),
                    lambda c, *_: (c, 0, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((U, G, 8, bb), jnp.int32),
                    pltpu.VMEM((U, 8, G, bb), jnp.int32),
                    pltpu.SemaphoreType.DMA((U,))],
            ),
        )(uniq_p, cnt_p, cell_map, sh_p, bank)

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
