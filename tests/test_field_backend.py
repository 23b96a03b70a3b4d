"""Device field backend vs. the Python-int oracle: random-vector
cross-checks over all supported fields, adversarial edge values, and
repr round-trips."""

import random

import jax
import jax.numpy as jnp
import pytest

from bellpepper_tpu.backend.field_jnp import get_backend
from bellpepper_tpu.fields import PALLAS_SCALAR, SCALAR, VESTA_SCALAR

RNG = random.Random(0x5962BE3D)
FIELDS = [SCALAR, PALLAS_SCALAR, VESTA_SCALAR]


def edge_values(p):
    return [0, 1, 2, p - 1, p - 2, (p - 1) // 2, 1 << 128, (1 << 255) % p]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_limb_roundtrip(field):
    be = get_backend(field)
    vals = [RNG.randrange(field.p) for _ in range(32)] + edge_values(field.p)
    assert be.from_limbs(be.to_limbs(vals)) == vals


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(field):
    be = get_backend(field)
    p = field.p
    xs = [RNG.randrange(p) for _ in range(61)] + edge_values(p)
    ys = edge_values(p) + [RNG.randrange(p) for _ in range(61)]
    a = jnp.asarray(be.to_limbs(xs))
    b = jnp.asarray(be.to_limbs(ys))
    add = be.from_limbs(jax.jit(be.add)(a, b))
    sub = be.from_limbs(jax.jit(be.sub)(a, b))
    neg = be.from_limbs(jax.jit(be.neg)(a))
    for x, y, r in zip(xs, ys, add):
        assert r == (x + y) % p
    for x, y, r in zip(xs, ys, sub):
        assert r == (x - y) % p
    for x, r in zip(xs, neg):
        assert r == (-x) % p


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mul(field):
    be = get_backend(field)
    p = field.p
    xs = [RNG.randrange(p) for _ in range(120)] + edge_values(p)
    ys = edge_values(p) + [RNG.randrange(p) for _ in range(120)]
    a = jnp.asarray(be.to_limbs(xs))
    b = jnp.asarray(be.to_limbs(ys))
    mul = be.from_limbs(jax.jit(be.mul)(a, b))
    for x, y, r in zip(xs, ys, mul):
        assert r == (x * y) % p, (x, y)


def test_mul_worst_case_carry():
    """(p-1)² and dense-limb values exercise maximal carry chains."""
    be = get_backend(SCALAR)
    p = SCALAR.p
    dense = int("ff" * 31, 16) % p
    xs = [p - 1, dense, (1 << 254) % p]
    a = jnp.asarray(be.to_limbs(xs))
    got = be.from_limbs(jax.jit(be.mul)(a, a))
    for x, r in zip(xs, got):
        assert r == (x * x) % p


@pytest.mark.parametrize("field", [SCALAR, PALLAS_SCALAR], ids=lambda f: f.name)
def test_inv(field):
    be = get_backend(field)
    p = field.p
    xs = [RNG.randrange(1, p) for _ in range(7)] + [0]
    a = jnp.asarray(be.to_limbs(xs))
    inv = be.from_limbs(jax.jit(be.inv)(a))
    for x, r in zip(xs, inv):
        if x == 0:
            assert r == 0
        else:
            assert (x * r) % p == 1


def test_eq_is_zero():
    be = get_backend(SCALAR)
    a = jnp.asarray(be.to_limbs([0, 5, SCALAR.p - 1]))
    b = jnp.asarray(be.to_limbs([0, 6, SCALAR.p - 1]))
    assert list(be.eq(a, b)) == [True, False, True]
    assert list(be.is_zero(a)) == [True, False, False]


def test_mul_pow2():
    be = get_backend(SCALAR)
    p = SCALAR.p
    xs = [RNG.randrange(p) for _ in range(4)]
    a = jnp.asarray(be.to_limbs(xs))
    for k in (0, 1, 13, 254):
        got = be.from_limbs(be.mul_pow2(a, k))
        for x, r in zip(xs, got):
            assert r == (x << k) % p
