"""v2 kernel tails: quotient-estimate canonicalization (_canon_tail_v2)
and the Montgomery zero-test (_mont_zero_rows) must agree with the
shift-subtract chain (_chain_rows) — the v1 oracle — on random values
and on the adversarial corners (exact multiples of p, ±1 neighbours,
domain extremes). These row functions are plain jnp on (8, 128) tiles,
so the comparison runs without Pallas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellpepper_tpu.backend import field_pallas as fp
from bellpepper_tpu.fields import PALLAS_SCALAR, SCALAR, VESTA_SCALAR

FIELDS = [SCALAR, PALLAS_SCALAR, VESTA_SCALAR]


def _to_rows(vals, n_limbs):
    """list of ints → [n_limbs] list of (8, 128) uint32 tiles."""
    assert len(vals) <= 8 * 128
    vals = list(vals) + [0] * (8 * 128 - len(vals))
    arr = np.zeros((n_limbs, 8, 128), np.uint32)
    for j, v in enumerate(vals):
        for i in range(n_limbs):
            arr[i, j // 128, j % 128] = (v >> (16 * i)) & 0xFFFF
    return [jnp.asarray(arr[i]) for i in range(n_limbs)]


def _from_rows(rows):
    out = []
    arr = np.stack([np.asarray(r) for r in rows])
    for j in range(8 * 128):
        out.append(
            sum(int(arr[i, j // 128, j % 128]) << (16 * i) for i in range(len(rows)))
        )
    return out


def _corner_values(p, bound):
    vals = [0, 1, p - 1, p, p + 1, 2 * p - 1, 2 * p, bound - 1, bound - p]
    q_max = (bound - 1) // p
    for k in (2, 3, q_max - 1, q_max):
        for d in (-1, 0, 1):
            v = k * p + d
            if 0 <= v < bound:
                vals.append(v)
    rng = np.random.default_rng(7)
    for _ in range(200):
        vals.append(int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % bound)
    for _ in range(200):
        k = int(rng.integers(0, q_max + 1))
        vals.append(k * p)
    return [v for v in vals if 0 <= v < bound][: 8 * 128]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_canon_tail_v2_matches_chain(field):
    consts = fp._Consts(field)
    assert consts.qe is not None, "255-bit fields must take the v2 tail"
    vals = _corner_values(field.p, 1 << 266)
    x17 = _to_rows(vals, 17)
    got = _from_rows(fp._canon_tail_v2(list(x17), consts))
    ref = _from_rows(fp._chain_rows(list(x17), consts)[:16])
    chain_dom = field.p << 11  # v1 oracle's input domain
    for j, v in enumerate(vals):
        assert got[j] == v % field.p, f"value #{j}"
        if v < chain_dom:
            assert ref[j] == v % field.p, f"chain oracle #{j}"


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_zero_rows_exact(field):
    consts = fp._Consts(field)
    p = field.p
    vals = _corner_values(p, 1 << 266)
    x17 = _to_rows(vals, 17)
    bad = np.asarray(fp._mont_zero_rows(list(x17), consts))
    for j, v in enumerate(vals):
        got_bad = bad[j // 128, j % 128] != 0
        assert got_bad == (v % p != 0), f"value #{j} = {v}"


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_fold1_split_congruent(field):
    """The split-multiplier fold must preserve the value mod p for
    inputs at the mulcmp accumulator bound (34 positions < 2^21 after
    carry → d < 2^16 per position here)."""
    consts = fp._Consts(field)
    p = field.p
    rng = np.random.default_rng(11)
    vals = [int(rng.integers(0, 1 << 63)) for _ in range(64)]
    # build 34-position 16-bit digit rows for random < 2^544 values
    big = [
        int.from_bytes(rng.bytes(68), "little") for _ in range(64)
    ]
    d = _to_rows(big, 34)
    acc = fp._fold1_split(list(d), consts, 18)
    d2 = fp._carry16_rows(acc, 18)
    got = _from_rows(d2)
    for j, v in enumerate(big):
        assert got[j] % p == v % p, f"value #{j}"


def test_reduce16_rows_full_pipeline():
    """End-to-end modmul rows (conv + v2 tail) vs python int math on
    corner operand pairs."""
    field = SCALAR
    consts = fp._Consts(field)
    p = field.p
    ops = [0, 1, 2, p - 1, p - 2, (p - 1) // 2, p >> 128, 3]
    pairs = [(a, b) for a in ops for b in ops][: 8 * 128]
    a16 = _to_rows([a for a, _b in pairs], 16)
    b16 = _to_rows([b for _a, b in pairs], 16)
    out = fp._reduce16_rows(fp._conv16_rows(a16, b16), consts)
    got = _from_rows(out)
    for j, (a, b) in enumerate(pairs):
        assert got[j] == a * b % p, f"pair #{j} = ({a}, {b})"
