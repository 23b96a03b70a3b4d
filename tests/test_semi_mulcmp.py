"""Semi-reduced matvec output + fused mul-compare kernel parity
(interpret mode): the check pipeline's az·bz ≡ cz (mod p) verdict must be
exact for arbitrary semi-reduced representatives (< 2^265) of the
operands, including deliberately corrupted products."""

import random

import numpy as np
import pytest

from bellpepper_tpu.backend.field_pallas import (
    SEMI,
    TILE,
    make_bits_matvec_bucket,
    make_mulcmp,
)
from bellpepper_tpu.fields import PALLAS_SCALAR, SCALAR


def test_semi_matvec_congruent():
    rng = np.random.default_rng(11)
    p = SCALAR.p
    random.seed(7)
    K, n_rows, B = 4, 8, 128
    coeffs = [0, 1, 2, p - 1, random.randrange(p)]
    cids = rng.integers(0, len(coeffs), size=(n_rows, K))
    cd8 = np.zeros((len(coeffs), 32), np.uint32)
    for t, c in enumerate(coeffs):
        for d in range(32):
            cd8[t, d] = (c >> (8 * d)) & 0xFF
    cd_b = cd8[cids].reshape(n_rows, K, 32).transpose(2, 0, 1).copy()
    bv = rng.integers(0, 2, size=(n_rows, K, B)).astype(np.uint32)
    kern = make_bits_matvec_bucket(
        SCALAR, K, n_rows, B, interpret=True, out_form="semi"
    )
    out = np.asarray(kern(bv, cd_b))
    assert out.shape == (SEMI, n_rows, B)
    for r in range(n_rows):
        for b in (0, B - 1):
            want = (
                sum(int(coeffs[cids[r, k]]) * int(bv[r, k, b]) for k in range(K))
                % p
            )
            got = sum(int(out[l, r, b]) << (16 * l) for l in range(SEMI))
            assert got % p == want
            assert got < 1 << 265  # the mulcmp input bound


@pytest.mark.parametrize("field", [SCALAR, PALLAS_SCALAR], ids=lambda f: f.name)
def test_mulcmp_parity(field):
    p = field.p
    random.seed(13)
    N = TILE

    def semi_rep(v):
        k = random.randrange((1 << 264) // p)
        w = v + k * p
        return [(w >> (16 * l)) & 0xFFFF for l in range(SEMI)]

    A = np.zeros((SEMI, N), np.uint32)
    B = np.zeros((SEMI, N), np.uint32)
    C = np.zeros((SEMI, N), np.uint32)
    bad_expect = np.zeros(N, bool)
    for i in range(N):
        a = random.randrange(p)
        b = random.randrange(p)
        c = (a * b) % p
        if i % 3 == 0:  # corrupt: must be flagged
            c = (c + random.randrange(1, p)) % p
            bad_expect[i] = True
        for l, d in enumerate(semi_rep(a)):
            A[l, i] = d
        for l, d in enumerate(semi_rep(b)):
            B[l, i] = d
        for l, d in enumerate(semi_rep(c)):
            C[l, i] = d
    mc = make_mulcmp(field, interpret=True)
    mask = np.asarray(mc(A, B, C)) != 0
    assert (mask == bad_expect).all()
