"""Fused bits-matvec bucket kernel (make_bits_matvec_bucket) against
Python-int field arithmetic in interpret mode, covering the VPU
short-contraction branch (K ≤ 16) and the MXU branch (K ≥ 32)."""

import numpy as np
import pytest

from bellpepper_tpu.backend.field_pallas import make_bits_matvec_bucket
from bellpepper_tpu.fields import SCALAR


@pytest.mark.parametrize(
    "K,n_rows,B", [(2, 8, 128), (4, 16, 128), (16, 8, 128), (32, 8, 128)]
)
def test_bits_kernel_interpret(K, n_rows, B):
    rng = np.random.default_rng(5 + K)
    p = SCALAR.p
    coeffs = [0, 1, 2, p - 1, int(rng.integers(1, 1 << 61))]
    cids = rng.integers(0, len(coeffs), size=(n_rows, K))
    cd8 = np.zeros((len(coeffs), 32), np.uint32)
    for t, c in enumerate(coeffs):
        for d in range(32):
            cd8[t, d] = (c >> (8 * d)) & 0xFF
    cd_b = cd8[cids].reshape(n_rows, K, 32).transpose(2, 0, 1).copy()
    bv = rng.integers(0, 2, size=(n_rows, K, B)).astype(np.uint32)
    kern = make_bits_matvec_bucket(SCALAR, K, n_rows, B, interpret=True)
    out = np.asarray(kern(bv, cd_b))  # [16, n_rows, B]
    for r in range(n_rows):
        for b in (0, B // 2, B - 1):
            want = (
                sum(int(coeffs[cids[r, k]]) * int(bv[r, k, b]) for k in range(K))
                % p
            )
            got = sum(int(out[l, r, b]) << (16 * l) for l in range(16))
            assert got == want, (K, r, b)
