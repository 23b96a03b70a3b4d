"""Boolean gadget tests: exhaustive operand-type enumeration (the
reference's OperandType grid, boolean.rs:1074-1547) plus mutation-kill
soundness checks."""

import itertools

import pytest

from bellpepper_tpu import SCALAR, TestConstraintSystem
from bellpepper_tpu.gadgets.boolean import (
    AllocatedBit,
    Boolean,
    field_into_allocated_bits_le,
    u64_into_boolean_vec_le,
)

ONE = SCALAR.ONE
ZERO = SCALAR.ZERO


def test_allocated_bit_alloc():
    for b in (True, False):
        cs = TestConstraintSystem()
        bit = AllocatedBit.alloc(cs, b)
        assert bit.get_value() == b
        assert cs.get("boolean") == (ONE if b else ZERO)
        assert cs.is_satisfied()
        # Mutate: a non-boolean value must kill the boolean constraint.
        cs.set("boolean", 2)
        assert cs.which_is_unsatisfied() == "boolean constraint"


def test_xor():
    for a_val, b_val in itertools.product((False, True), repeat=2):
        cs = TestConstraintSystem()
        a = AllocatedBit.alloc(cs.namespace("a"), a_val)
        b = AllocatedBit.alloc(cs.namespace("b"), b_val)
        c = AllocatedBit.xor(cs, a, b)
        assert c.get_value() == (a_val ^ b_val)
        assert cs.is_satisfied()
        # Flip the result: must become unsatisfied.
        cs.set("xor result", ONE if not c.get_value() else ZERO)
        assert not cs.is_satisfied()


def test_and_and_not_nor():
    cases = [
        ("and result", AllocatedBit.and_, lambda a, b: a and b),
        ("and not result", AllocatedBit.and_not, lambda a, b: a and not b),
        ("nor result", AllocatedBit.nor, lambda a, b: not a and not b),
    ]
    for name, op, semantics in cases:
        for a_val, b_val in itertools.product((False, True), repeat=2):
            cs = TestConstraintSystem()
            a = AllocatedBit.alloc(cs.namespace("a"), a_val)
            b = AllocatedBit.alloc(cs.namespace("b"), b_val)
            c = op(cs, a, b)
            assert c.get_value() == semantics(a_val, b_val)
            assert cs.is_satisfied()
            cs.set(name, ONE if not c.get_value() else ZERO)
            assert not cs.is_satisfied()


def test_alloc_conditionally():
    # (1 - must_be_false - a) * a = 0
    for must, val, ok in [
        (False, False, True),
        (False, True, True),
        (True, False, True),
        (True, True, False),  # must_be_false=1 forces a=0
    ]:
        cs = TestConstraintSystem()
        m = AllocatedBit.alloc(cs.namespace("m"), must)
        AllocatedBit.alloc_conditionally(cs.namespace("x"), val, m)
        assert cs.is_satisfied() == ok


# -- the 6-operand-type grid ---------------------------------------------------
OPERAND_TYPES = [
    "true",
    "false",
    "alloc_true",
    "alloc_false",
    "neg_alloc_true",  # Not(bit with value true) → boolean False
    "neg_alloc_false",  # Not(bit with value false) → boolean True
]


def make_operand(cs, name, ty):
    if ty == "true":
        return Boolean.constant(True)
    if ty == "false":
        return Boolean.constant(False)
    if ty == "alloc_true":
        return Boolean.from_bit(AllocatedBit.alloc(cs.namespace(name), True))
    if ty == "alloc_false":
        return Boolean.from_bit(AllocatedBit.alloc(cs.namespace(name), False))
    if ty == "neg_alloc_true":
        return Boolean.from_bit(AllocatedBit.alloc(cs.namespace(name), True)).not_()
    if ty == "neg_alloc_false":
        return Boolean.from_bit(AllocatedBit.alloc(cs.namespace(name), False)).not_()
    raise AssertionError(ty)


def operand_value(ty):
    return {
        "true": True,
        "false": False,
        "alloc_true": True,
        "alloc_false": False,
        "neg_alloc_true": False,
        "neg_alloc_false": True,
    }[ty]


@pytest.mark.parametrize("op,semantics", [
    (Boolean.xor, lambda a, b: a ^ b),
    (Boolean.and_, lambda a, b: a and b),
    (Boolean.or_, lambda a, b: a or b),
])
def test_boolean_binary_grid(op, semantics):
    for ta, tb in itertools.product(OPERAND_TYPES, repeat=2):
        cs = TestConstraintSystem()
        a = make_operand(cs, "a", ta)
        b = make_operand(cs, "b", tb)
        c = op(cs, a, b)
        assert cs.is_satisfied()
        assert c.get_value() == semantics(operand_value(ta), operand_value(tb))


@pytest.mark.parametrize("op,semantics", [
    (Boolean.sha256_ch, lambda a, b, c: (a and b) ^ ((not a) and c)),
    (Boolean.sha256_maj, lambda a, b, c: (a and b) ^ (a and c) ^ (b and c)),
])
def test_boolean_ternary_grid(op, semantics):
    for ta, tb, tc in itertools.product(OPERAND_TYPES, repeat=3):
        cs = TestConstraintSystem()
        a = make_operand(cs, "a", ta)
        b = make_operand(cs, "b", tb)
        c = make_operand(cs, "c", tc)
        out = op(cs, a, b, c)
        assert cs.is_satisfied()
        assert out.get_value() == semantics(
            operand_value(ta), operand_value(tb), operand_value(tc)
        )


def test_ch_maj_constraint_costs():
    # 1 constraint for ch, 2 for maj when all inputs allocated
    # (boolean.rs:629-634, 741-752).
    cs = TestConstraintSystem()
    a = make_operand(cs, "a", "alloc_true")
    b = make_operand(cs, "b", "alloc_false")
    c = make_operand(cs, "c", "alloc_true")
    base = cs.num_constraints()
    Boolean.sha256_ch(cs.namespace("ch"), a, b, c)
    assert cs.num_constraints() - base == 1
    base = cs.num_constraints()
    Boolean.sha256_maj(cs.namespace("maj"), a, b, c)
    assert cs.num_constraints() - base == 2


def test_enforce_equal():
    from bellpepper_tpu.constraint_system import UnsatisfiableError

    # constants
    cs = TestConstraintSystem()
    Boolean.enforce_equal(cs, Boolean.constant(True), Boolean.constant(True))
    with pytest.raises(UnsatisfiableError):
        Boolean.enforce_equal(cs, Boolean.constant(True), Boolean.constant(False))

    for a_val, b_val in itertools.product((False, True), repeat=2):
        cs = TestConstraintSystem()
        a = Boolean.from_bit(AllocatedBit.alloc(cs.namespace("a"), a_val))
        b = Boolean.from_bit(AllocatedBit.alloc(cs.namespace("b"), b_val))
        Boolean.enforce_equal(cs.namespace("eq"), a, b)
        assert cs.is_satisfied() == (a_val == b_val)


def test_u64_into_boolean_vec_le():
    cs = TestConstraintSystem()
    bits = u64_into_boolean_vec_le(cs, 0xDEADBEEF_CAFEBABE)
    assert cs.is_satisfied()
    assert len(bits) == 64
    assert bits[0].get_value() == ((0xDEADBEEF_CAFEBABE >> 0) & 1 == 1)
    for i, bit in enumerate(bits):
        assert bit.get_value() == ((0xDEADBEEF_CAFEBABE >> i) & 1 == 1)


def test_field_into_allocated_bits_le():
    cs = TestConstraintSystem()
    # A known value below the modulus.
    v = 0x1234_5678_9ABC_DEF0_1234_5678
    bits = field_into_allocated_bits_le(cs, v)
    assert cs.is_satisfied()
    assert len(bits) == SCALAR.NUM_BITS == 255
    for i, bit in enumerate(bits):
        assert bit.get_value() == bool((v >> i) & 1)


def test_boolean_negation_free():
    cs = TestConstraintSystem()
    b = Boolean.from_bit(AllocatedBit.alloc(cs, True))
    n0 = cs.num_constraints()
    nb = b.not_()
    assert cs.num_constraints() == n0  # free
    assert nb.get_value() is False
    assert nb.not_().get_value() is True
