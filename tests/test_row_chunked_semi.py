"""Row-chunked check internals: slice-mode matrices, semi-reduced blocks.

The monolithic-check fast path (build_row_chunked_check) relies on
(a) contiguous identity matrices collapsing to dynamic slices,
(b) semi-reduced 16-bit limb sums matching the canonical digit pipeline.
The fused mulcmp compare itself is TPU-only (covered by the config5
benchmark); everything below it is plain jnp and verified here.

Reference hot loop being replaced: test_cs.rs:239-253."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellpepper_tpu.backend.field_jnp import get_backend
from bellpepper_tpu.backend.matvec import (
    build_row_chunked_check,
    build_row_chunked_eval,
)
from bellpepper_tpu.fields import SCALAR
from bellpepper_tpu.r1cs import COOMatrix, R1CS


def _synthetic(R=1 << 10, N0=1 << 8, identity_c=True, seed=7):
    """config5-shaped system: (c1·z[i1] + c2·z[i2]) · z[i3] = C-row."""
    rng = np.random.default_rng(seed)
    c1 = int(rng.integers(2, 1 << 60))
    c2 = int(rng.integers(2, 1 << 60))
    i1 = rng.integers(1, N0, size=R)
    i2 = rng.integers(1, N0, size=R)
    i3 = rng.integers(1, N0, size=R)
    rows = np.arange(R)
    a = COOMatrix(
        rows=np.repeat(rows, 2),
        cols=np.stack([i1, i2], 1).reshape(-1),
        coeff_ids=np.tile(np.array([1, 2]), R),
    )
    b = COOMatrix(rows=rows.copy(), cols=i3.copy(), coeff_ids=np.zeros(R, np.int64))
    if identity_c:
        c_cols = N0 + 1 + rows  # contiguous → slice mode
    else:
        c_cols = N0 + 1 + rng.permutation(R)  # shuffled → gather mode
    c = COOMatrix(rows=rows.copy(), cols=c_cols, coeff_ids=np.zeros(R, np.int64))
    r1cs = R1CS(
        field=SCALAR,
        num_inputs=1,
        num_aux=N0 + R,
        num_constraints=R,
        a=a,
        b=b,
        c=c,
        coeff_table=[1, c1, c2],
        names=None,
    )
    p = SCALAR.p
    zv = [1] + [int(x) % p for x in rng.integers(0, 1 << 63, size=N0)] + [0] * R
    prod_slot = np.empty(R, np.int64)
    prod_slot[c_cols - (N0 + 1)] = rows  # product for row r lives at its C col
    for r_ in range(R):
        av = (c1 * zv[i1[r_]] + c2 * zv[i2[r_]]) % p
        zv[int(c_cols[r_])] = (av * zv[i3[r_]]) % p
    be = get_backend(SCALAR)
    z = jnp.asarray(be.to_limbs(zv))
    return r1cs, z, be


def _semi_to_ints(s17, p):
    s = np.asarray(s17, np.uint64).T  # [rpc, 17]
    return [int(sum(int(x) << (16 * i) for i, x in enumerate(row))) % p for row in s]


def test_slice_mode_detected_and_semi_matches_canonical():
    r1cs, z, be = _synthetic()
    ef, prep = build_row_chunked_eval(r1cs, 4)
    assert ef._semi_ok
    assert set(prep["c"].keys()) == {"start"}, "identity C should be slice-mode"
    cl = prep["coeff_limbs"]
    # also a NON-canonical witness (random 16-bit limbs, values ≥ p): the
    # semi blocks must stay equivalent mod p, and the canonical blocks
    # must still return reduced values (slice mode keeps the reduction)
    rng = np.random.default_rng(123)
    z_raw = jnp.asarray(
        rng.integers(0, 1 << 16, size=z.shape).astype(np.uint32)
    )
    xs_all = ef._xs(prep, ("a", "b", "c"))  # ELL entries stored flat
    for zz in (z, z_raw):
        zsrc = ef._zsrc(zz, cl)
        for k in range(4):
            xs = jax.tree.map(lambda a: a[k], xs_all)
            cans = ef._blocks(zsrc, cl, xs, ("a", "b", "c"))
            semis = ef._blocks_semi(zsrc, cl, xs, ("a", "b", "c"))
            for name, can, semi in zip("abc", cans, semis):
                assert semi.shape[0] == 17
                vals = be.from_limbs(can)
                assert all(v < SCALAR.p for v in vals), name
                assert _semi_to_ints(semi, SCALAR.p) == vals, name


def test_non_contiguous_c_still_checks():
    r1cs, z, _ = _synthetic(identity_c=False)
    ef, prep = build_row_chunked_eval(r1cs, 4)
    assert "start" not in prep["c"], "shuffled C must not be slice-mode"
    check, prep2 = build_row_chunked_check(r1cs, 4)
    nb, _first = jax.jit(check)(z, prep2)
    assert int(nb) == 0


def test_check_and_corruption_detection():
    r1cs, z, _ = _synthetic()
    check, prep = build_row_chunked_check(r1cs, 4)
    cj = jax.jit(check)
    nb, _f = cj(z, prep)
    assert int(nb) == 0
    zb = z.at[5, 0].set(z[5, 0] ^ 1)
    nb2, first = cj(zb, prep)
    assert int(nb2) > 0


def test_semi_check_path_interpret():
    """Drive the TPU fast-path check end-to-end with the Pallas kernels in
    interpreter mode (CPU): semi blocks + fused mulcmp compare."""
    from bellpepper_tpu.backend.field_pallas import SEMI, TILE, make_mulcmp

    r1cs, z, _ = _synthetic(R=TILE * 4, N0=1 << 8)
    ef, prep = build_row_chunked_eval(r1cs, 4)
    assert ef._semi_ok and ef._rpc % TILE == 0
    mulcmp = make_mulcmp(SCALAR, interpret=True)
    cl = prep["coeff_limbs"]
    zsrc = ef._zsrc(z, cl)
    xs0 = jax.tree.map(lambda a: a[0], ef._xs(prep, ("a", "b", "c")))
    az, bz, cz = ef._blocks_semi(zsrc, cl, xs0, ("a", "b", "c"))
    bad = mulcmp(az, bz, cz)
    assert int(jnp.sum((bad != 0).astype(jnp.uint32))) == 0
    # corrupt one product value inside this chunk → exactly that row fails
    zb = z.at[int(1 << 8) + 1 + 3, 0].set(z[(1 << 8) + 1 + 3, 0] ^ 1)
    zsrc_b = ef._zsrc(zb, cl)
    azb, bzb, czb = ef._blocks_semi(zsrc_b, cl, xs0, ("a", "b", "c"))
    badb = mulcmp(azb, bzb, czb)
    assert int(jnp.argmax(badb != 0)) == 3


def test_zero_constraint_system_vacuously_satisfied():
    """A constraint-free R1CS must report satisfied everywhere instead of
    crashing on empty argmax/concat (review finding)."""
    from bellpepper_tpu.backend.matvec import (
        Satisfier,
        build_row_chunked_product,
        build_templated_check,
    )
    from bellpepper_tpu.r1cs import COOMatrix, R1CS

    e = COOMatrix(
        rows=np.zeros(0, np.int64),
        cols=np.zeros(0, np.int64),
        coeff_ids=np.zeros(0, np.int64),
    )
    r0 = R1CS(
        field=SCALAR,
        num_inputs=1,
        num_aux=3,
        num_constraints=0,
        a=e,
        b=e,
        c=e,
        coeff_table=[1],
        names=None,
    )
    be = get_backend(SCALAR)
    z = jnp.asarray(be.to_limbs([1, 5, 6, 7]))
    assert Satisfier(r0, use_pallas=False).is_satisfied(z)
    chk, prep = build_row_chunked_check(r0, 1)
    nb, _f = chk(z, prep)
    assert int(nb) == 0
    prod, prep2 = build_row_chunked_product(r0, 1)
    assert prod(z, prep2).shape == (0, 16)
    viol = build_templated_check(r0, 1, False, "limbs")
    assert viol(z[None]).shape == (0,)


def test_layout_reuse_across_chunk_counts():
    """One layout build must serve both the checker and the
    witness-completion product at DIFFERENT chunk counts (flat ELL
    entries + trace-time reshape): same verdicts, same products, no
    second device upload."""
    from bellpepper_tpu.backend.matvec import (
        build_row_chunked_check,
        build_row_chunked_product,
    )

    r1cs, z, be = _synthetic()
    check, prep = build_row_chunked_check(r1cs, 4)
    prod_r, prep_r = build_row_chunked_product(
        r1cs, 8, reuse=(check._layout_meta, prep)
    )
    # reused prep shares the very same device buffers for a and b
    assert prep_r["a"] is prep["a"] and prep_r["b"] is prep["b"]
    prod_f, prep_f = build_row_chunked_product(r1cs, 8)
    got_r = np.asarray(jax.jit(prod_r)(z, prep_r))
    got_f = np.asarray(jax.jit(prod_f)(z, prep_f))
    assert (got_r == got_f).all()
    nb, _ = jax.jit(check)(z, prep)
    assert int(nb) == 0
