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


def test_premul_on_off_parity():
    """Span-bounded coefficient premul must be bit-identical to the
    per-entry modmul path, including zero-coefficient entries (which the
    premul path drops via the mask)."""
    rng = np.random.default_rng(17)
    r0, z = _synthetic(seed=17)
    # widen the table with a zero coefficient and point some A entries at it
    a = r0.a
    cids = np.asarray(a.coeff_ids).copy()
    cids[rng.integers(0, len(cids), size=8)] = 4
    r1cs = R1CS(
        field=SCALAR,
        num_inputs=r0.num_inputs,
        num_aux=r0.num_aux,
        num_constraints=r0.num_constraints,
        a=COOMatrix(rows=a.rows, cols=a.cols, coeff_ids=cids),
        b=r0.b,
        c=r0.c,
        coeff_table=list(r0.coeff_table) + [0],
    )
    outs = {}
    for pm in (False, True):
        eval_fn, prep = build_row_chunked_eval(r1cs, 4, premul_table=pm)
        outs[pm] = [np.asarray(x) for x in jax.jit(eval_fn)(z, prep)]
    for x, y in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(x, y)


def test_skewed_row_degree_falls_back_to_segment_sum():
    """A single dense row must not blow up the ELL padding — the builder
    falls back to segment_sum and still matches the monolithic eval."""
    rng = np.random.default_rng(23)
    R, N0 = 64, 32
    rows_a = np.concatenate(
        [np.zeros(40, np.int32), np.arange(R, dtype=np.int32)]
    )
    a = COOMatrix(
        rows=np.sort(rows_a),
        cols=rng.integers(1, N0, size=len(rows_a)).astype(np.int32),
        coeff_ids=rng.integers(0, 4, size=len(rows_a)).astype(np.int32),
    )
    rows = np.arange(R, dtype=np.int32)
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
        coeff_table=[1, 2, (1 << 17) % SCALAR.p, SCALAR.p - 1],
    )
    rng2 = np.random.default_rng(5)
    z0 = rng2.integers(0, 1 << 16, size=(1 + N0 + R, 16)).astype(np.uint32)
    z0[0] = 0
    z0[0, 0] = 1
    z = jnp.asarray(z0)

    be = get_backend(SCALAR)
    dev = DeviceR1CS.from_r1cs(r1cs)
    az, bz, cz = r1cs_eval(be, dev, z)
    eval_fn, prep = build_row_chunked_eval(r1cs, 4)
    az2, bz2, cz2 = jax.jit(eval_fn)(z, prep)
    np.testing.assert_array_equal(np.asarray(az), np.asarray(az2))
    np.testing.assert_array_equal(np.asarray(bz), np.asarray(bz2))
    np.testing.assert_array_equal(np.asarray(cz), np.asarray(cz2))


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
