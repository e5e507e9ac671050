"""Field-kernel tests: JAX limb ops vs the Python-int host oracle.

Strategy follows the reference's own trick of testing algebra over a tiny
prime (circom_algebra/src/algebra.rs:1390-1494 uses F_257) plus the real
production primes.
"""

import random

import numpy as np
import pytest

from circom_tpu.field.primes import FieldSpec, field_spec
from circom_tpu.field.hostfield import HostField
from circom_tpu.ops.jfield import JaxField
from circom_tpu.ops.limbs import int_to_limbs, limbs_to_int, ints_to_limbs

SPECS = [
    FieldSpec("f257", 257),
    field_spec("goldilocks"),
    field_spec("bn128"),
    field_spec("bls12381"),
]

rng = random.Random(0xC1C0)

_jit_cache = {}


def jop(jf, name, *static):
    """Jitted field op (cached): eager dispatch is ~4ms/op in this env."""
    import jax

    key = (jf.spec.name, name, static)
    if key not in _jit_cache:
        fn = getattr(jf, name)
        _jit_cache[key] = jax.jit(lambda *args: fn(*args, *static))
    return _jit_cache[key]


def sample(spec, n):
    vals = [0, 1, 2, spec.p - 1, spec.p - 2, spec.half, spec.half + 1]
    while len(vals) < n:
        vals.append(rng.randrange(spec.p))
    return vals[:n]


def test_limb_roundtrip():
    spec = field_spec("bn128")
    for v in sample(spec, 20):
        assert limbs_to_int(int_to_limbs(v, spec.n_limbs)) == v


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_roundtrip(spec):
    jf = JaxField(spec)
    vals = sample(spec, 16)
    a = jf.encode(vals)
    m = jop(jf, 'to_mont')(a)
    back = jop(jf, 'from_mont')(m)
    assert jf.decode(back) == vals
    # encode straight to mont agrees
    assert np.array_equal(np.asarray(m), jf.encode(vals, mont=True))


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_ring_ops(spec):
    hf, jf = HostField(spec), JaxField(spec)
    xs, ys = sample(spec, 24), list(reversed(sample(spec, 24)))
    ax, ay = jf.encode(xs, mont=True), jf.encode(ys, mont=True)
    assert jf.decode(jop(jf, 'add')(ax, ay), mont=True) == [hf.add(x, y) for x, y in zip(xs, ys)]
    assert jf.decode(jop(jf, 'sub')(ax, ay), mont=True) == [hf.sub(x, y) for x, y in zip(xs, ys)]
    assert jf.decode(jop(jf, 'neg')(ax), mont=True) == [hf.neg(x) for x in xs]
    assert jf.decode(jop(jf, 'mont_mul')(ax, ay), mont=True) == [hf.mul(x, y) for x, y in zip(xs, ys)]
    # NORM-domain multiply
    nx, ny = jf.encode(xs), jf.encode(ys)
    assert jf.decode(jop(jf, 'mul_norm')(nx, ny)) == [hf.mul(x, y) for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pow_inv_div(spec):
    hf, jf = HostField(spec), JaxField(spec)
    xs = [v for v in sample(spec, 12) if v != 0]
    ax = jf.encode(xs, mont=True)
    assert jf.decode(jop(jf, 'pow_mont', 5)(ax), mont=True) == [hf.pow(x, 5) for x in xs]
    assert jf.decode(jop(jf, 'inv_mont')(ax), mont=True) == [hf.inv(x) for x in xs]
    ys = list(reversed(xs))
    ay = jf.encode(ys, mont=True)
    assert jf.decode(jop(jf, 'div_mont')(ax, ay), mont=True) == [
        hf.div(x, y) for x, y in zip(xs, ys)
    ]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_comparisons(spec):
    hf, jf = HostField(spec), JaxField(spec)
    xs, ys = sample(spec, 24), list(reversed(sample(spec, 24)))
    ax, ay = jf.encode(xs), jf.encode(ys)
    for name, hop in [
        ('lt', hf.lesser), ('le', hf.lesser_eq),
        ('gt', hf.greater), ('ge', hf.greater_eq),
        ('eq', hf.eq), ('neq', hf.not_eq),
        ('bool_and', hf.bool_and), ('bool_or', hf.bool_or),
    ]:
        assert jf.decode(jop(jf, name)(ax, ay)) == [hop(x, y) for x, y in zip(xs, ys)], name
    assert jf.decode(jop(jf, 'bool_not')(ax)) == [hf.bool_not(x) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_bit_ops(spec):
    hf, jf = HostField(spec), JaxField(spec)
    xs, ys = sample(spec, 24), list(reversed(sample(spec, 24)))
    ax, ay = jf.encode(xs), jf.encode(ys)
    assert jf.decode(jop(jf, 'bit_and')(ax, ay)) == [hf.bit_and(x, y) for x, y in zip(xs, ys)]
    assert jf.decode(jop(jf, 'bit_or')(ax, ay)) == [hf.bit_or(x, y) for x, y in zip(xs, ys)]
    assert jf.decode(jop(jf, 'bit_xor')(ax, ay)) == [hf.bit_xor(x, y) for x, y in zip(xs, ys)]
    assert jf.decode(jop(jf, 'complement')(ax)) == [hf.complement(x) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_shifts(spec):
    hf, jf = HostField(spec), JaxField(spec)
    xs = sample(spec, 16)
    ax = jf.encode(xs)
    ks = [0, 1, 7, 15, 16, 17, min(31, spec.bits - 1), spec.bits - 1]
    for k in ks:
        assert jf.decode(jop(jf, 'shift_r_const', k)(ax)) == [hf.shift_r(x, k) for x in xs], k
        assert jf.decode(jop(jf, 'shift_l_const', k)(ax)) == [hf.shift_l(x, k) for x in xs], k


def test_host_semantics_reference_vectors():
    """The reference's own unit vectors (modular_arithmetic.rs:217-269)."""
    hf = HostField(FieldSpec("f257", 257))
    assert (-8) % 5 == 2
    a = hf.sub(2, 1)
    assert hf.as_bool(hf.not_eq(a, -1 % 257))
    assert hf.mod(17, 32) == 17
    assert hf.complement(hf.complement(1234 % 257)) == 1234 % 257
    assert hf.as_bool(hf.lesser_eq(0, 2))
    # signed convention: p-1 == -1 < 0
    assert hf.lesser(257 - 1, 0) == 1
    assert hf.greater(hf.half, 0) == 1
    assert hf.lesser(hf.half + 1, 0) == 1


def test_goldilocks_fold_mul():
    """gl_mul (fold reduction via 2^64 ≡ 2^32-1, 2^96 ≡ -1) matches
    host arithmetic on adversarial and random pairs — the TPU analog
    of the reference's dedicated 64-bit runtime (common64/)."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from circom_tpu.ops.limb_emit import LimbEmitter
    from circom_tpu.ops.limbs import int_to_limbs, limbs_to_int

    spec = field_spec("goldilocks")
    em = LimbEmitter(spec)
    assert em.is_goldilocks
    p = spec.p
    rng = random.Random(5)
    cases = [(p - 1, p - 1), (p - 1, 1), (0, 123), (1, 1),
             (2**32 - 1, 2**32 - 1), (2**32, 2**32),
             (p - 2**32, p - 1), (2**63, 2**63)]
    cases += [(rng.randrange(p), rng.randrange(p)) for _ in range(200)]
    zero = jnp.zeros((8, 8), jnp.uint32)
    for (x, y) in cases:
        xa = [jnp.full((8, 8), np.uint32(v), jnp.uint32)
              for v in int_to_limbs(x, 4)]
        yl = [np.uint32(v) for v in int_to_limbs(y, 4)]

        rows = em.gl_mul(lambda k, i: xa[i] if k == 0 else yl[i], zero)
        got = limbs_to_int([int(np.asarray(r)[0, 0]) for r in rows])
        assert got == (x * y) % p, (x, y)
