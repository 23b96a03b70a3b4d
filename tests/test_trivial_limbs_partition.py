"""Limbs-form trivial-row partition: booleanity rows become limb
compares, rows whose three LCs carry <= 2 variable terms with {1, p-1}
coefficients assemble operands directly into the modmul compare, and the
remaining (wide/odd-coefficient) rows keep the fold-matvec pipeline
(matvec._classify_trivial_limb_rows / _build_trivial_limbs_check).

The partitioned mask must be bit-identical to the unpartitioned one,
per row, for satisfied AND corrupted witnesses — with corruptions
aimed at each of the three row classes.

This is the limbs-form sibling of test_small_row_partition.py; the rows
being fast-pathed are the limb encoding of the reference's coeff==1
skip-mul hot loop (lc.rs:245-267) and booleanity (boolean.rs:90-96).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from bellpepper_tpu import SCALAR, TestConstraintSystem
from bellpepper_tpu.backend.field_jnp import get_backend
from bellpepper_tpu.backend.matvec import (
    _classify_trivial_limb_rows,
    build_templated_check,
)
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multipack import pack_bits
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.r1cs import R1CS

RNG = random.Random(0x71E5)
P = SCALAR.p


def _circuit(cs, seed):
    """Mixed field-arithmetic circuit: num chains (trivial rows),
    allocated bits (booleanity rows), and a multipack row (wide fold
    row with 2^i coefficients)."""
    rng = random.Random(seed)
    a = AllocatedNum.alloc(cs.namespace("a"), rng.randrange(P))
    b = AllocatedNum.alloc(cs.namespace("b"), rng.randrange(P))
    c = a.mul(cs.namespace("ab"), b)
    d = c.add(cs.namespace("ab plus a"), a)
    e = d.square(cs.namespace("sq"))
    e.mul(cs.namespace("final"), b)
    bits = [
        Boolean.from_bit(
            AllocatedBit.alloc(cs.namespace(f"bit {i}"), rng.random() < 0.5)
        )
        for i in range(12)
    ]
    pack_bits(cs.namespace("pack"), bits)


def _template_and_z(b_insts):
    """Template R1CS + z3 [B, S_t, 16] from per-instance host synthesis."""
    be = get_backend(SCALAR)
    zs = []
    template = None
    for i in range(b_insts):
        cs = TestConstraintSystem()
        _circuit(cs, seed=1000 + i)
        assert cs.is_satisfied()
        if template is None:
            template = R1CS.from_test_cs(cs)
        zs.append(be.to_limbs(cs.scalar_inputs() + cs.scalar_aux()))
    return template, jnp.asarray(np.stack(zs))


def test_partition_finds_all_three_classes():
    template, _ = _template_and_z(1)
    part = _classify_trivial_limb_rows(template)
    assert part is not None
    bit_rows, triv_rows, fold_idx = part
    assert len(bit_rows) == 12, "each AllocatedBit contributes one booleanity row"
    assert len(triv_rows) > 0, "num chain rows must classify as trivial"
    assert len(fold_idx) > 0, "the multipack row must stay on the fold path"
    assert len(bit_rows) + len(triv_rows) + len(fold_idx) == template.num_constraints


def test_partitioned_limbs_mask_matches_unpartitioned():
    B = 4
    template, z3 = _template_and_z(B)
    part = _classify_trivial_limb_rows(template)
    bit_rows, triv_rows, fold_idx = part
    R = template.num_constraints

    v_split = jax.jit(build_templated_check(template, B, False, "limbs"))
    v_plain = jax.jit(
        build_templated_check(template, B, False, "limbs", _partition=False)
    )
    ok = np.asarray(v_split(z3))
    assert not ok.any(), "witness must satisfy"
    np.testing.assert_array_equal(ok, np.asarray(v_plain(z3)))

    be = get_backend(SCALAR)

    def corrupt(inst, slot, value):
        limbs = jnp.asarray(be.to_limbs([value]))[0]
        return z3.at[inst, slot].set(limbs)

    # One corruption aimed at each row class: a booleanity slot set to 2
    # (canonical, non-boolean), a product slot shifted, and a packed num
    # shifted (only the wide multipack row reads it). Masks must agree
    # bit-exactly and each class must trip at least once.
    tripped = {"bit": False, "triv": False, "fold": False}
    bit_slot = bit_rows[0][1]
    triv_c_slot = next(
        spec_c[1][0][0] for _r, _sa, _sb, spec_c in triv_rows if spec_c[1]
    )
    S = z3.shape[1]
    cases = [
        corrupt(1, bit_slot, 2),
        corrupt(2, triv_c_slot, RNG.randrange(P)),
        corrupt(3, S - 1, RNG.randrange(P)),  # pack output is the last aux
    ]
    bit_set = {r for r, _ in bit_rows}
    triv_set = {r for r, *_ in triv_rows}
    fold_set = set(int(r) for r in fold_idx)
    for vb in cases:
        m_split = np.asarray(v_split(vb))
        np.testing.assert_array_equal(m_split, np.asarray(v_plain(vb)))
        assert m_split.any(), "corruption must be detected"
        rows_hit = set(np.nonzero(m_split.reshape(B, R))[1].tolist())
        tripped["bit"] |= bool(rows_hit & bit_set)
        tripped["triv"] |= bool(rows_hit & triv_set)
        tripped["fold"] |= bool(rows_hit & fold_set)
    assert all(tripped.values()), tripped


def test_random_circuits_partition_parity():
    """Random mul/add/square DAGs (config-1 shape): partitioned verdict
    per row equals unpartitioned across random witnesses."""
    for trial in range(3):
        rng = random.Random(0xA11CE + trial)
        cs = TestConstraintSystem()
        nums = [
            AllocatedNum.alloc(cs.namespace(f"in {i}"), rng.randrange(P))
            for i in range(4)
        ]
        for step in range(16):
            op = rng.randrange(3)
            x, y = rng.choice(nums), rng.choice(nums)
            ns = cs.namespace(f"op {step}")
            nums.append(
                x.mul(ns, y)
                if op == 0
                else x.add(ns, y)
                if op == 1
                else x.square(ns)
            )
        assert cs.is_satisfied()
        template = R1CS.from_test_cs(cs)
        # Most rows classify trivial; x.add(x) folds to coeff 2, which
        # correctly stays on the fold path.
        part = _classify_trivial_limb_rows(template)
        assert part is not None and len(part[1]) > len(part[2])
        be = get_backend(SCALAR)
        z = jnp.asarray(
            np.stack([be.to_limbs(cs.scalar_inputs() + cs.scalar_aux())] * 2)
        )
        v_split = jax.jit(build_templated_check(template, 2, False, "limbs"))
        v_plain = jax.jit(
            build_templated_check(template, 2, False, "limbs", _partition=False)
        )
        np.testing.assert_array_equal(
            np.asarray(v_split(z)), np.asarray(v_plain(z))
        )
        zb = z.at[1, 2].set(jnp.asarray(be.to_limbs([rng.randrange(P)]))[0])
        np.testing.assert_array_equal(
            np.asarray(v_split(zb)), np.asarray(v_plain(zb))
        )
