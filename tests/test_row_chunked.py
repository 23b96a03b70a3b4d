"""Row-chunked eval/check for huge single systems (scan over row blocks
— bounded peak memory). Parity oracle: the monolithic r1cs_eval."""

import numpy as np
import jax
import jax.numpy as jnp

from bellpepper_tpu.backend.field_jnp import get_backend
from bellpepper_tpu.backend.matvec import (
    DeviceR1CS,
    build_row_chunked_check,
    build_row_chunked_eval,
    r1cs_eval,
)
from bellpepper_tpu.fields import SCALAR
from bellpepper_tpu.r1cs import COOMatrix, R1CS


def _synthetic(R=64, N0=32, seed=3):
    rng = np.random.default_rng(seed)
    rows = np.arange(R, dtype=np.int32)
    coeff_table = [1, 2, (1 << 17) % SCALAR.p, SCALAR.p - 1]
    a = COOMatrix(
        rows=np.repeat(rows, 2),
        cols=rng.integers(1, N0, size=2 * R).astype(np.int32),
        coeff_ids=rng.integers(0, 4, size=2 * R).astype(np.int32),
    )
    b = COOMatrix(
        rows=rows.copy(),
        cols=rng.integers(1, N0, size=R).astype(np.int32),
        coeff_ids=np.zeros(R, np.int32),
    )
    c = COOMatrix(
        rows=rows.copy(),
        cols=(N0 + 1 + rows).astype(np.int32),
        coeff_ids=np.zeros(R, np.int32),
    )
    r1cs = R1CS(
        field=SCALAR,
        num_inputs=1,
        num_aux=N0 + R,
        num_constraints=R,
        a=a,
        b=b,
        c=c,
        coeff_table=coeff_table,
    )
    z0 = rng.integers(0, 1 << 16, size=(1 + N0 + R, 16)).astype(np.uint32)
    z0[0] = 0
    z0[0, 0] = 1
    return r1cs, jnp.asarray(z0)


def test_chunked_eval_matches_monolithic():
    r1cs, z = _synthetic()
    be = get_backend(SCALAR)
    dev = DeviceR1CS.from_r1cs(r1cs)
    az, bz, cz = r1cs_eval(be, dev, z)

    for n_chunks in (1, 4, 16):
        eval_fn, prep = build_row_chunked_eval(r1cs, n_chunks)
        az2, bz2, cz2 = jax.jit(eval_fn)(z, prep)
        np.testing.assert_array_equal(np.asarray(az), np.asarray(az2))
        np.testing.assert_array_equal(np.asarray(bz), np.asarray(bz2))
        np.testing.assert_array_equal(np.asarray(cz), np.asarray(cz2))


def test_chunked_product_matches():
    from bellpepper_tpu.backend.matvec import build_row_chunked_product

    r1cs, z = _synthetic(seed=9)
    be = get_backend(SCALAR)
    dev = DeviceR1CS.from_r1cs(r1cs)
    az, bz, _ = r1cs_eval(be, dev, z)
    want = np.asarray(be.mul(az, bz))

    prod_fn, prep = build_row_chunked_product(r1cs, 8)
    got = np.asarray(jax.jit(prod_fn)(z, prep))
    np.testing.assert_array_equal(want, got)


def test_chunked_check_verdict_and_first():
    r1cs, z = _synthetic()
    be = get_backend(SCALAR)
    dev = DeviceR1CS.from_r1cs(r1cs)
    az, bz, _ = r1cs_eval(be, dev, z)
    # complete the product segment so the system is satisfied
    prod = be.mul(az, bz)
    z = z.at[r1cs.num_inputs + 32 :].set(prod)

    check_fn, prep = build_row_chunked_check(r1cs, 4)
    check = jax.jit(check_fn)
    nb, first = check(z, prep)
    assert int(nb) == 0

    # corrupt the product of row 37 -> exactly that row must fail
    zbad = z.at[r1cs.num_inputs + 32 + 37, 0].set(
        z[r1cs.num_inputs + 32 + 37, 0] ^ 1
    )
    nb, first = check(zbad, prep)
    assert int(nb) == 1
    assert int(first) == 37
