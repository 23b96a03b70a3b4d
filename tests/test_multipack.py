"""multipack + boolean_utils + lookup tests (multipack.rs:107-149,
boolean_utils.rs:152-195, lookup.rs test module)."""

import itertools
import random

from bellpepper_tpu import SCALAR, TestConstraintSystem
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.boolean_utils import (
    alloc_num_is_zero,
    and_,
    and_v,
    or_,
    or_v,
)
from bellpepper_tpu.gadgets.lookup import (
    lookup3_xy,
    lookup3_xy_with_conditional_negation,
    synth,
)
from bellpepper_tpu.gadgets.multipack import (
    bytes_to_bits,
    bytes_to_bits_le,
    compute_multipacking,
    pack_bits,
    pack_into_inputs,
)
from bellpepper_tpu.gadgets.num import AllocatedNum, Num

RNG = random.Random(0x5962BE3D)


def test_multipacking():
    # Sweep of bit lengths incl. CAPACITY boundaries (reference sweeps
    # 0..1500; we hit the interesting sizes).
    for num_bits in [0, 1, 253, 254, 255, 508, 509, 700]:
        cs = TestConstraintSystem()
        bits = [RNG.random() < 0.5 for _ in range(num_bits)]
        circuit_bits = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"bit {i}"), b))
            for i, b in enumerate(bits)
        ]
        expected = compute_multipacking(SCALAR, bits)
        pack_into_inputs(cs.namespace("pack"), circuit_bits)
        assert cs.is_satisfied()
        assert cs.verify(expected)


def test_bytes_to_bits():
    assert bytes_to_bits(b"\x80\x01") == [True] + [False] * 14 + [True]
    assert bytes_to_bits_le(b"\x80\x01") == [False] * 7 + [True, True] + [False] * 7


def test_pack_bits():
    cs = TestConstraintSystem()
    bits = [RNG.random() < 0.5 for _ in range(100)]
    circuit_bits = [
        Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"bit {i}"), b))
        for i, b in enumerate(bits)
    ]
    packed = pack_bits(cs.namespace("pack"), circuit_bits)
    assert cs.is_satisfied()
    assert packed.get_value() == sum(1 << i for i, b in enumerate(bits) if b)


def test_alloc_num_is_zero():
    for v, expected in [(0, True), (5, False)]:
        cs = TestConstraintSystem()
        n = AllocatedNum.alloc(cs.namespace("n"), v)
        num = Num.from_allocated_num(SCALAR, n)
        result = alloc_num_is_zero(cs.namespace("is_zero"), num)
        assert cs.is_satisfied()
        assert result.get_value() == expected
        # is-zero costs 3 constraints (result booleanity + 2).
        assert cs.num_constraints() == 3


def test_and_or_v():
    # Mirrors the proptest over 5 bools (boolean_utils.rs:158-194).
    for vals in itertools.product((False, True), repeat=5):
        cs = TestConstraintSystem()
        a, b, c, d, e = [Boolean.constant(v) for v in vals]
        and0 = and_(cs, a, b, c, label="and0")
        and1 = and_(cs, a, b, c, d, label="and1")
        and2 = and_(cs, a, b, c, d, e, label="and2")
        or0 = or_(cs, a, b, c, label="or0")
        or1 = or_(cs, a, b, c, d, label="or1")
        or2 = or_(cs, a, b, c, d, e, label="or2")
        x0, x1, x2, x3, x4 = vals
        assert and0.get_value() == (x0 and x1 and x2)
        assert and1.get_value() == (x0 and x1 and x2 and x3)
        assert and2.get_value() == (x0 and x1 and x2 and x3 and x4)
        assert or0.get_value() == (x0 or x1 or x2)
        assert or1.get_value() == (x0 or x1 or x2 or x3)
        assert or2.get_value() == (x0 or x1 or x2 or x3 or x4)
        assert cs.is_satisfied()


def test_and_or_v_allocated():
    for vals in itertools.product((False, True), repeat=4):
        cs = TestConstraintSystem()
        bools = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), v))
            for i, v in enumerate(vals)
        ]
        a = and_v(cs.namespace("and_v"), bools)
        o = or_v(cs.namespace("or_v"), bools)
        assert cs.is_satisfied()
        assert a.get_value() == all(vals)
        assert o.get_value() == any(vals)


def test_synth_multilinear():
    """synth produces coefficients such that evaluating the multilinear
    polynomial at each boolean point returns the original constant."""
    field = SCALAR
    constants = [RNG.randrange(field.p) for _ in range(8)]
    coeffs = [0] * 8
    synth(field, 3, constants, coeffs)
    for point in range(8):
        acc = 0
        for mask in range(8):
            if mask & point == mask:
                acc = field.add(acc, coeffs[mask])
        assert acc == constants[point]


def test_lookup3_xy():
    coords = [(RNG.randrange(SCALAR.p), RNG.randrange(SCALAR.p)) for _ in range(8)]
    for idx in range(8):
        cs = TestConstraintSystem()
        bits = [
            Boolean.from_bit(
                AllocatedBit.alloc(cs.namespace(f"b{i}"), bool((idx >> i) & 1))
            )
            for i in range(3)
        ]
        x, y = lookup3_xy(cs.namespace("lookup"), bits, coords)
        assert cs.is_satisfied()
        assert (x.get_value(), y.get_value()) == coords[idx]
    # Cost: 3 booleanity + 1 precomp AND + 2 lookups = 6.
    assert cs.num_constraints() == 6


def test_lookup3_xy_with_conditional_negation():
    coords = [(RNG.randrange(SCALAR.p), RNG.randrange(SCALAR.p)) for _ in range(4)]
    for idx in range(4):
        for sign in (False, True):
            cs = TestConstraintSystem()
            sel = [bool(idx & 1), bool(idx & 2), sign]
            bits = [
                Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), v))
                for i, v in enumerate(sel)
            ]
            x, y = lookup3_xy_with_conditional_negation(
                cs.namespace("lookup"), bits, coords
            )
            assert cs.is_satisfied()
            assert x.get_value() == coords[idx][0]
            expected_y = coords[idx][1]
            if sign:
                expected_y = SCALAR.neg(expected_y)
            assert y.get_value() == expected_y
