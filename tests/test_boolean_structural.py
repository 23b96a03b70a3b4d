"""Structural operand-grid tests for Boolean xor/and/or/ch/maj.

The reference's grids (boolean.rs:1108-1547 for xor/and, 1822+ for ch/maj)
assert not just values but the STRUCTURAL result — the variant
(Is/Not/Constant), the allocated intermediate names, and the per-case
constraint count. These tests re-derive that expectation from an
independent Python model of the reference's rewrite rules (written from
the boolean.rs source, not from this repo's implementation), so a
rewrite-rule regression that still produces correct values is caught.
"""

import itertools

import pytest

from bellpepper_tpu import TestConstraintSystem
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean

OPERAND_TYPES = [
    "true",
    "false",
    "alloc_true",
    "alloc_false",
    "neg_alloc_true",
    "neg_alloc_false",
]


def make_operand(cs, name, ty):
    if ty == "true":
        return Boolean.constant(True)
    if ty == "false":
        return Boolean.constant(False)
    bit_val = ty in ("alloc_true", "neg_alloc_true")
    b = Boolean.from_bit(AllocatedBit.alloc(cs.namespace(name), bit_val))
    return b.not_() if ty.startswith("neg_") else b


# ---------------------------------------------------------------------------
# Spec model: operands and results are ('const', v) | ('is', bit_v) |
# ('not', bit_v); ops return (result, n_constraints, alloc_names) where
# alloc_names are the aux names allocated INSIDE the op under `prefix`.
# Transcribed from boolean.rs:463-759.
# ---------------------------------------------------------------------------
def spec_operand(ty):
    if ty == "true":
        return ("const", True)
    if ty == "false":
        return ("const", False)
    bit = ty in ("alloc_true", "neg_alloc_true")
    kind = "not" if ty.startswith("neg_") else "is"
    return (kind, bit)


def spec_value(op):
    kind, v = op
    return (not v) if kind == "not" else v


def spec_not(op):
    kind, v = op
    if kind == "const":
        return ("const", not v)
    return ("not" if kind == "is" else "is", v)


def spec_xor(a, b, prefix=""):
    # boolean.rs:472-491
    if a[0] == "const" and b[0] == "const":
        return ("const", a[1] ^ b[1]), 0, set()
    if a == ("const", False):
        return b, 0, set()
    if b == ("const", False):
        return a, 0, set()
    if a == ("const", True):
        return spec_not(b), 0, set()
    if b == ("const", True):
        return spec_not(a), 0, set()
    # AllocatedBit::xor on the underlying bits; Not-ness folds into the
    # result variant: Is^Is=Is, Is^Not=Not, Not^Not=Is.
    bit = a[1] ^ b[1]
    kind = "is" if (a[0] == b[0]) else "not"
    return (kind, bit), 1, {prefix + "xor result"}


def spec_and(a, b, prefix=""):
    # boolean.rs:494-516
    if a[0] == "const" and b[0] == "const":
        return ("const", a[1] and b[1]), 0, set()
    if a == ("const", False) or b == ("const", False):
        return ("const", False), 0, set()
    if a == ("const", True):
        return b, 0, set()
    if b == ("const", True):
        return a, 0, set()
    if a[0] == "is" and b[0] == "is":
        return ("is", a[1] and b[1]), 1, {prefix + "and result"}
    if a[0] == "is" and b[0] == "not":
        return ("is", a[1] and not b[1]), 1, {prefix + "and not result"}
    if a[0] == "not" and b[0] == "is":
        return ("is", b[1] and not a[1]), 1, {prefix + "and not result"}
    return ("is", (not a[1]) and (not b[1])), 1, {prefix + "nor result"}


def spec_or(a, b, prefix=""):
    # boolean.rs:519-533: or(a,b) = not(and(not a, not b)) under the
    # namespace "not and (not a) (not b)".
    r, n, names = spec_and(
        spec_not(a), spec_not(b), prefix + "not and (not a) (not b)/"
    )
    return spec_not(r), n, names


def spec_ch(a, b, c, prefix=""):
    # boolean.rs:536-641
    vals = (spec_value(a), spec_value(b), spec_value(c))
    ch_v = (vals[0] and vals[1]) ^ ((not vals[0]) and vals[2])
    if a[0] == b[0] == c[0] == "const":
        return ("const", ch_v), 0, set()
    if a == ("const", False):
        return c, 0, set()
    if b == ("const", False):
        return spec_and(spec_not(a), c, prefix)
    if c == ("const", False):
        return spec_and(a, b, prefix)
    if c == ("const", True):
        r, n, names = spec_and(a, spec_not(b), prefix)
        return spec_not(r), n, names
    if b == ("const", True):
        r, n, names = spec_and(spec_not(a), spec_not(c), prefix)
        return spec_not(r), n, names
    # a == const true falls through to the generic 1-constraint path.
    return ("is", ch_v), 1, {prefix + "ch"}


def spec_maj(a, b, c, prefix=""):
    # boolean.rs:644-759
    vals = (spec_value(a), spec_value(b), spec_value(c))
    maj_v = (
        (vals[0] and vals[1])
        ^ (vals[0] and vals[2])
        ^ (vals[1] and vals[2])
    )
    if a[0] == b[0] == c[0] == "const":
        return ("const", maj_v), 0, set()
    if a == ("const", False):
        return spec_and(b, c, prefix)
    if b == ("const", False):
        return spec_and(a, c, prefix)
    if c == ("const", False):
        return spec_and(a, b, prefix)
    if c == ("const", True):
        r, n, names = spec_and(spec_not(a), spec_not(b), prefix)
        return spec_not(r), n, names
    if b == ("const", True):
        r, n, names = spec_and(spec_not(a), spec_not(c), prefix)
        return spec_not(r), n, names
    if a == ("const", True):
        r, n, names = spec_and(spec_not(b), spec_not(c), prefix)
        return spec_not(r), n, names
    # generic: bc = and(ns("b and c"), b, c) then alloc "maj".
    _bc, n_and, names_and = spec_and(b, c, prefix + "b and c/")
    return ("is", maj_v), n_and + 1, names_and | {prefix + "maj"}


def check_structure(result: Boolean, expected):
    kind, v = expected
    if kind == "const":
        assert result.kind == Boolean.CONST
        assert result.const_value == v
    else:
        want = Boolean.IS if kind == "is" else Boolean.NOT
        assert result.kind == want, (result.kind, expected)
        # The UNDERLYING bit value (before Not projection).
        assert result.bit.get_value() == v


def added_aux_names(cs, base_names):
    return set(cs.aux()) - base_names


@pytest.mark.parametrize(
    "op,spec",
    [
        (Boolean.xor, spec_xor),
        (Boolean.and_, spec_and),
        (Boolean.or_, spec_or),
    ],
)
def test_binary_grid_structural(op, spec):
    for ta, tb in itertools.product(OPERAND_TYPES, repeat=2):
        cs = TestConstraintSystem()
        a = make_operand(cs, "a", ta)
        b = make_operand(cs, "b", tb)
        base_aux = set(cs.aux())
        base_cons = cs.num_constraints()
        r = op(cs, a, b)
        expected, n_cons, names = spec(spec_operand(ta), spec_operand(tb))
        assert cs.is_satisfied()
        check_structure(r, expected)
        assert cs.num_constraints() - base_cons == n_cons, (ta, tb)
        assert added_aux_names(cs, base_aux) == names, (ta, tb)


@pytest.mark.parametrize(
    "op,spec",
    [
        (Boolean.sha256_ch, spec_ch),
        (Boolean.sha256_maj, spec_maj),
    ],
)
def test_ternary_grid_structural(op, spec):
    for ta, tb, tc in itertools.product(OPERAND_TYPES, repeat=3):
        cs = TestConstraintSystem()
        a = make_operand(cs, "a", ta)
        b = make_operand(cs, "b", tb)
        c = make_operand(cs, "c", tc)
        base_aux = set(cs.aux())
        base_cons = cs.num_constraints()
        r = op(cs, a, b, c)
        expected, n_cons, names = spec(
            spec_operand(ta), spec_operand(tb), spec_operand(tc)
        )
        assert cs.is_satisfied()
        check_structure(r, expected)
        assert cs.num_constraints() - base_cons == n_cons, (ta, tb, tc)
        assert added_aux_names(cs, base_aux) == names, (ta, tb, tc)


def test_to_bits_mutation_names():
    # num.rs:707-713: corrupting one decomposition bit must fail exactly
    # the "bit N/boolean constraint"-adjacent unpacking constraint.
    from bellpepper_tpu import SCALAR
    from bellpepper_tpu.gadgets.num import AllocatedNum

    cs = TestConstraintSystem()
    n = AllocatedNum.alloc(cs.namespace("num"), 0b1011)
    n.to_bits_le_strict(cs.namespace("bits"))
    assert cs.is_satisfied()
    # Flip a SET bit to zero (bits are allocated MSB-first, so find one by
    # value): booleanity still holds, so the failure must surface at the
    # packing equation — num.rs names it "unpacking constraint".
    set_bit = next(
        name
        for name in cs.aux()
        if name.startswith("bits/bit ") and cs.get(name) == SCALAR.ONE
    )
    cs.set(set_bit, SCALAR.ZERO)
    assert cs.which_is_unsatisfied() == "bits/unpacking constraint"
    # And a non-boolean value must be caught by that bit's own constraint.
    cs2 = TestConstraintSystem()
    m = AllocatedNum.alloc(cs2.namespace("num"), 0b1011)
    m.to_bits_le_strict(cs2.namespace("bits"))
    cs2.set("bits/bit 3/boolean", 2)
    assert cs2.which_is_unsatisfied() == "bits/bit 3/boolean constraint"
