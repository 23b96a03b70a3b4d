"""UInt32 / MultiEq tests mirroring the reference's uint32.rs + multieq.rs
test modules: conversions, free rotr/shr, xor/ch/maj semantics, addmany
with mutation-kill."""

import random

from bellpepper_tpu import SCALAR, TestConstraintSystem
from bellpepper_tpu.gadgets.boolean import Boolean
from bellpepper_tpu.gadgets.multieq import MultiEq
from bellpepper_tpu.gadgets.uint32 import UInt32

RNG = random.Random(0x5962BE3D)


def u32s(n):
    return [RNG.randrange(1 << 32) for _ in range(n)]


def check_bits(u: UInt32, value: int):
    for i, b in enumerate(u.bits):
        assert b.get_value() == bool((value >> i) & 1)


def test_constant_and_alloc():
    v = 0xDEADBEEF
    c = UInt32.constant(v)
    assert c.value == v
    check_bits(c, v)

    cs = TestConstraintSystem()
    a = UInt32.alloc(cs, v)
    assert cs.is_satisfied()
    assert a.value == v
    check_bits(a, v)
    assert cs.num_constraints() == 32  # booleanity per bit


def test_bits_roundtrip():
    for _ in range(20):
        v = RNG.randrange(1 << 32)
        u = UInt32.constant(v)
        assert UInt32.from_bits(u.into_bits()).value == v
        assert UInt32.from_bits_be(u.into_bits_be()).value == v


def test_rotr_shr_free():
    cs = TestConstraintSystem()
    v = RNG.randrange(1 << 32)
    u = UInt32.alloc(cs, v)
    n0 = cs.num_constraints()
    for by in (0, 1, 7, 13, 31, 32):
        r = u.rotr(by)
        expected = ((v >> (by % 32)) | (v << (32 - (by % 32)))) & 0xFFFFFFFF if by % 32 else v
        assert r.value == expected
        check_bits(r, expected)
        s = u.shr(by)
        assert s.value == v >> (by % 32)
        check_bits(s, v >> (by % 32))
    assert cs.num_constraints() == n0  # zero constraints


def test_xor():
    # 1000 fixed-seed iterations, matching uint32.rs:428's test depth.
    for _ in range(1000):
        a_v, b_v = u32s(2)
        cs = TestConstraintSystem()
        a = UInt32.alloc(cs.namespace("a"), a_v)
        b = UInt32.alloc(cs.namespace("b"), b_v)
        c = a.xor(cs.namespace("xor"), b)
        assert cs.is_satisfied()
        assert c.value == a_v ^ b_v
        check_bits(c, a_v ^ b_v)


def test_ch_maj():
    for _ in range(200):
        a_v, b_v, c_v = u32s(3)
        cs = TestConstraintSystem()
        a = UInt32.alloc(cs.namespace("a"), a_v)
        b = UInt32.alloc(cs.namespace("b"), b_v)
        c = UInt32.alloc(cs.namespace("c"), c_v)
        ch = UInt32.sha256_ch(cs.namespace("ch"), a, b, c)
        maj = UInt32.sha256_maj(cs.namespace("maj"), a, b, c)
        assert cs.is_satisfied()
        assert ch.value == (a_v & b_v) ^ (~a_v & b_v & 0) ^ ((a_v ^ 0xFFFFFFFF) & c_v)
        assert maj.value == (a_v & b_v) ^ (a_v & c_v) ^ (b_v & c_v)


def test_addmany():
    # 50 random value draws per operand count (reference: 1000 iterations
    # across its addmany variants, uint32.rs:428).
    for nops in (2, 3, 7, 10):
        for it in range(50):
            vals = u32s(nops)
            cs = TestConstraintSystem()
            ops = [
                UInt32.alloc(cs.namespace(f"op {i}"), v)
                for i, v in enumerate(vals)
            ]
            with MultiEq(cs) as mcs:
                result = UInt32.addmany(mcs.namespace("addmany"), ops)
            expected = sum(vals) & 0xFFFFFFFF
            assert result.value == expected
            check_bits(result, expected)
            assert cs.is_satisfied()

            if it == 0:
                # Mutation-kill (uint32.rs:626-633): flip one result bit.
                cs.set(
                    "addmany/result bit 0/boolean",
                    1 if expected & 1 == 0 else 0,
                )
                assert not cs.is_satisfied()


def test_addmany_constants():
    cs = TestConstraintSystem()
    vals = u32s(3)
    ops = [UInt32.constant(v) for v in vals]
    with MultiEq(cs) as mcs:
        result = UInt32.addmany(mcs.namespace("addmany"), ops)
    assert cs.num_constraints() == 0  # all-constant fast path
    assert result.value == sum(vals) & 0xFFFFFFFF


def test_multieq_packing():
    """Many small equalities pack into few wide constraints
    (multieq.rs:41-58): 10 equalities of 33 bits each fit 7-per-constraint
    at CAPACITY 254."""
    cs = TestConstraintSystem()
    vals = u32s(10)
    ops = [UInt32.alloc(cs.namespace(f"op {i}"), v) for i, v in enumerate(vals)]
    base = cs.num_constraints()
    with MultiEq(cs) as mcs:
        for i in range(0, 10, 2):
            UInt32.addmany(mcs.namespace(f"add {i}"), [ops[i], ops[i + 1]])
    # 5 addmany of 2 operands → 33 bits each → 254/33 = 7 per constraint →
    # 5 equalities fit in ONE multieq constraint; plus 33 result bits each.
    n_multieq = cs.num_constraints() - base - 5 * 33
    assert n_multieq == 1
    assert cs.is_satisfied()


def test_multieq_flush_on_capacity():
    cs = TestConstraintSystem()
    field = SCALAR
    with MultiEq(cs) as mcs:
        from bellpepper_tpu.lc import LinearCombination

        lhs = LinearCombination.zero(field)
        rhs = LinearCombination.zero(field)
        # 3 × 100-bit equalities: two fit (200 < 254), third forces a flush.
        for _ in range(3):
            mcs.enforce_equal(100, lhs, rhs)
    assert cs.num_constraints() == 2
    assert [c.name for c in cs.constraints()] == ["multieq 0", "multieq 1"]
