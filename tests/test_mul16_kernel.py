"""16-bit-limb Pallas multiply pipeline (field_pallas._conv16_rows /
_reduce16_rows) against Python-int field arithmetic, in interpret mode,
for every shipped field. The 16-limb convolution replaces the 8-bit
schoolbook (256 vs 1024 VPU multiplies); parity must be exact including
the p-1 / p-2 corner values that stress the shift-subtract chain."""

import random

import numpy as np
import pytest

from bellpepper_tpu.backend.field_jnp import get_backend
from bellpepper_tpu.backend.field_pallas import TILE, PallasFieldOps
from bellpepper_tpu.fields import PALLAS_SCALAR, SCALAR, VESTA_SCALAR


@pytest.mark.parametrize(
    "field", [SCALAR, PALLAS_SCALAR, VESTA_SCALAR], ids=lambda f: f.name
)
def test_mul16_kernel_parity(field):
    ops = PallasFieldOps(field, interpret=True)
    be = get_backend(field)
    rnd = random.Random(1234)
    N = TILE
    a = [rnd.randrange(field.p) for _ in range(N)]
    b = [rnd.randrange(field.p) for _ in range(N)]
    # corners: zero, one, p-1 (max canonical), products hugging p^2
    a[:4] = [0, 1, field.p - 1, field.p - 2]
    b[:4] = [0, field.p - 1, field.p - 1, 1]
    al = ops.to_limb_major(np.asarray(be.to_limbs(a)))
    bl = ops.to_limb_major(np.asarray(be.to_limbs(b)))
    out = np.asarray(ops.mul(al, bl))
    outd = np.asarray(ops.mul_digits(al, bl))
    expect = [(x * y) % field.p for x, y in zip(a, b)]
    got = [sum(int(out[l, i]) << (16 * l) for l in range(16)) for i in range(N)]
    gotd = [sum(int(outd[d, i]) << (8 * d) for d in range(32)) for i in range(N)]
    assert got == expect
    assert gotd == expect
