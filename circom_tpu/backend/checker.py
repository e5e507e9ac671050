"""Batched R1CS satisfaction checker: Az ∘ Bz − Cz == 0 on TPU.

The TPU-native equivalent of the reference's `--sanity_check` assertion
injection (circom/src/input_user.rs:514-520, store_bucket.rs:674-733):
instead of per-assignment asserts in generated code, the whole constraint
system is checked as three sparse matrix products over the field, batched
over witnesses.

Sparse layout: COO entries (row, col, coeff) per matrix; products
coeff·z[col] run as one Montgomery multiply over all nnz entries, row sums
via segment_sum on raw 16-bit limb planes (exact in uint32 for up to 2^16
entries per row), then a single fold + Montgomery step reduces the wide
row sum back into the field.

This module is also the witness-correctness test oracle (SURVEY.md §7.1
step 7).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..field.primes import LIMB_BITS, FieldSpec
from ..ops.jfield import MASK, JaxField
from ..ops.limbs import int_to_limbs, ints_to_limbs


class R1CSChecker:
    def __init__(self, rows, n_wires: int, spec: FieldSpec):
        """rows: list of (a, b, c) dicts wire->coeff (canonical ints)."""
        self.spec = spec
        self.jf = JaxField(spec)
        self.n_rows = len(rows)
        self.n_wires = n_wires
        L = self.jf.L
        R = 1 << (LIMB_BITS * L)
        p = spec.p
        self.coo = []
        for mi in range(3):
            rws, cols, coeffs = [], [], []
            for ri, row in enumerate(rows):
                for col, coef in sorted(row[mi].items()):
                    rws.append(ri)
                    cols.append(col)
                    coeffs.append((coef * R) % p)  # MONT form
            self.coo.append((
                np.asarray(rws, np.int32),
                np.asarray(cols, np.int32),
                ints_to_limbs(coeffs, L)[:, :, None],  # (nnz, L, 1)
            ))
    def _reduce_wide(self, sums):
        """uint32 (..., L+2, B) wide column sums (value < 2^16·p) ->
        canonical limbs mod p, preserving the summands' Montgomery scale.

        V = (sum of MONT values); mont_reduce_cols gives V·R^-1 mod p, and
        multiplying by R² restores V mod p (still MONT of the plain sum).
        """
        jf = self.jf
        L = jf.L
        pad = jnp.zeros(sums.shape[:-2] + (2 * L + 1 - sums.shape[-2],)
                        + sums.shape[-1:], jnp.uint32)
        cols = jnp.concatenate([sums, pad], axis=-2)
        w = jf.mont_reduce_cols(cols)          # V·R^-1 mod p
        return jf.mont_mul(w, jf.R2_limbs)     # V mod p

    def _matvec(self, mi, z_mont):
        """z_mont: (n_wires, L, B) MONT -> (n_rows, L, B) MONT."""
        jf = self.jf
        rws, cols, coeffs = self.coo[mi]
        if len(rws) == 0:
            return jnp.zeros((self.n_rows, jf.L) + z_mont.shape[-1:],
                             jnp.uint32)
        zc = z_mont[cols]                        # (nnz, L, B)
        prod = jf.mont_mul(zc, coeffs)           # (nnz, L, B) < p
        # wide row sums: limbwise segment_sum stays exact in uint32
        wide = jnp.concatenate(
            [prod, jnp.zeros(prod.shape[:-2] + (2,) + prod.shape[-1:],
                             jnp.uint32)], axis=-2)
        sums = jax.ops.segment_sum(wide, rws, num_segments=self.n_rows)
        return self._reduce_wide(sums)

    def check(self, z):
        """z: uint32 (n_wires, L, B) canonical witnesses (wire 0 = 1) —
        same layout the witness program produces.

        Returns bool (B,): all constraints satisfied per witness.
        """
        jf = self.jf
        z_mont = jf.to_mont(z)
        az = self._matvec(0, z_mont)   # Az·R
        bz = self._matvec(1, z_mont)   # Bz·R
        cz = self._matvec(2, z_mont)   # Cz·R
        # mont_mul(Az·R, Bz·R) = Az·Bz·R, same R-scale as cz:
        res = jf.sub(jf.mont_mul(az, bz), cz)
        return jnp.all(jf.is_zero(res), axis=0)

    def check_detailed(self, z):
        """Like check(), but also returns the first violated constraint
        index per witness (0 where satisfied) — the TPU analog of the
        reference's injected per-constraint asserts (--sanity_check,
        store_bucket.rs:674-733 / input_user.rs:514-520)."""
        jf = self.jf
        B = z.shape[-1]
        if self.n_rows == 0:
            # fully-simplified systems (every constraint eliminated)
            # are vacuously satisfied
            return jnp.ones((B,), bool), jnp.zeros((B,), jnp.int32)
        z_mont = jf.to_mont(z)
        az = self._matvec(0, z_mont)
        bz = self._matvec(1, z_mont)
        cz = self._matvec(2, z_mont)
        res = jf.sub(jf.mont_mul(az, bz), cz)
        bad = ~jf.is_zero(res)              # (n_rows, B)
        ok = ~jnp.any(bad, axis=0)
        first_bad = jnp.argmax(bad, axis=0)
        return ok, first_bad

    def check_witness_list(self, witnesses):
        """witnesses: list of lists of canonical ints -> bool per witness."""
        L = self.jf.L
        arr = np.stack([ints_to_limbs(w, L) for w in witnesses], axis=0)
        arr = np.transpose(arr, (1, 2, 0))  # (n_wires, L, B)
        return np.asarray(jax.jit(self.check)(arr))
