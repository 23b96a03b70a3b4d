"""Fused limbs-matvec correctness: the static fold-matrix formulation
(c·z mod p as a linear map over z's 8-bit digits) against Python-int
field arithmetic, and the Pallas kernel in interpret mode."""

import numpy as np
import pytest

from bellpepper_tpu.backend.field_pallas import (
    MAX_FUSED_LIMBS_K,
    fold_digit_table,
    make_limbs_matvec_bucket,
)
from bellpepper_tpu.fields import SCALAR


def digits32(v: int) -> np.ndarray:
    return np.array([(v >> (8 * i)) & 0xFF for i in range(32)], np.uint32)


def undigits(d) -> int:
    return sum(int(x) << (8 * i) for i, x in enumerate(d))


def test_fold_identity_math():
    # Σ_k c_k·z_k ≡ Σ_k Σ_j zd_k[j] · (c_k·2^{8j} mod p)  (mod p)
    rng = np.random.default_rng(3)
    p = SCALAR.p
    coeffs = [1, 2, p - 1, int(rng.integers(1, 1 << 62)), (1 << 200) % p]
    fd = fold_digit_table(SCALAR, coeffs)
    K = len(coeffs)
    zs = [int.from_bytes(rng.bytes(31), "little") % p for _ in range(K)]
    acc = np.zeros(32, np.uint64)
    for k in range(K):
        zd = digits32(zs[k])
        for j in range(32):
            acc += fd[k, j].astype(np.uint64) * np.uint64(zd[j])
    want = sum(c * z for c, z in zip(coeffs, zs)) % p
    assert undigits(acc) % p == want
    # Accumulator bound documented for the kernel holds here too.
    assert acc.max() < (1 << 32)


@pytest.mark.parametrize("K,n_rows,B", [(1, 8, 128), (2, 16, 128), (4, 8, 256)])
def test_limbs_kernel_interpret(K, n_rows, B):
    rng = np.random.default_rng(17 + K)
    p = SCALAR.p
    # Static per-slot coefficients; random witness values per (row, k, lane).
    cids = rng.integers(0, 5, size=(n_rows, K))
    coeffs = [0, 1, 2, p - 1, int(rng.integers(1, 1 << 61))]
    fd = fold_digit_table(SCALAR, coeffs)
    F = fd[cids].transpose(3, 0, 1, 2).reshape(32, n_rows, K * 32)
    zvals = np.array(
        [
            [
                [int.from_bytes(rng.bytes(31), "little") % p for _ in range(B)]
                for _ in range(K)
            ]
            for _ in range(n_rows)
        ],
        dtype=object,
    )
    zd = np.zeros((n_rows, K * 32, B), np.uint32)
    for r in range(n_rows):
        for k in range(K):
            for b in range(B):
                zd[r, k * 32 : (k + 1) * 32, b] = digits32(zvals[r, k, b])

    kern = make_limbs_matvec_bucket(SCALAR, K, n_rows, B, interpret=True)
    out = np.asarray(kern(zd, F.astype(np.uint32)))  # [16, n_rows, B]

    for r in range(n_rows):
        for b in (0, B // 2, B - 1):
            want = sum(
                coeffs[cids[r, k]] * zvals[r, k, b] for k in range(K)
            ) % p
            got = sum(int(out[l, r, b]) << (16 * l) for l in range(16))
            assert got == want, (r, b)


def test_fused_limbs_bound():
    assert MAX_FUSED_LIMBS_K == ((1 << 32) // (255 * 255)) // 32
    with pytest.raises(AssertionError):
        make_limbs_matvec_bucket(SCALAR, MAX_FUSED_LIMBS_K + 1, 8, 128)
