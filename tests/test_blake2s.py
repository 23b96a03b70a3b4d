"""BLAKE2s circuit tests: pinned 21,518 count, blank-hash vector, fixed
test vectors, hashlib cross-checks with personalization — mirroring
blake2s.rs:408-697."""

import hashlib
import random

from bellpepper_tpu import TestConstraintSystem
from bellpepper_tpu.gadgets.blake2s import blake2s
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean

RNG = random.Random(0x5962BE5D)
PERSON = b"12345678"


def bits_to_bytes_le(bits):
    return bytes(
        sum(int(bits[i * 8 + j]) << j for j in range(8))
        for i in range(len(bits) // 8)
    )


def gadget_blake2s(cs, data: bytes, person: bytes = PERSON):
    input_bits = []
    for byte_i, byte in enumerate(data):
        for bit_i in range(8):
            input_bits.append(
                Boolean.from_bit(
                    AllocatedBit.alloc(
                        cs.namespace(f"input bit {byte_i} {bit_i}"),
                        bool((byte >> bit_i) & 1),
                    )
                )
            )
    out = blake2s(cs, input_bits, person)
    return bits_to_bytes_le([b.get_value() for b in out])


def test_blank_hash():
    cs = TestConstraintSystem()
    out = blake2s(cs, [], PERSON)
    assert cs.is_satisfied()
    assert cs.num_constraints() == 0
    assert (
        bits_to_bytes_le([b.get_value() for b in out]).hex()
        == "c59f682376d137f3f255e671e207d1f2374ebe504e9314208a52d9f88d69e8c8"
    )


def test_blake2s_constraints():
    cs = TestConstraintSystem()
    input_bits = [
        Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"input bit {i}"), True))
        for i in range(512)
    ]
    blake2s(cs, input_bits, PERSON)
    assert cs.is_satisfied()
    assert cs.num_constraints() == 21518  # includes the 512 booleanity rows


def test_blake2s_precomp_constraints():
    """512 constant leading bits add no constraints (blake2s.rs:460-480)."""
    cs = TestConstraintSystem()
    input_bits = [Boolean.constant(RNG.random() < 0.5) for _ in range(512)] + [
        Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"input bit {i}"), True))
        for i in range(512)
    ]
    blake2s(cs, input_bits, PERSON)
    assert cs.is_satisfied()
    assert cs.num_constraints() == 21518


def test_blake2s_constant_constraints():
    cs = TestConstraintSystem()
    input_bits = [Boolean.constant(RNG.random() < 0.5) for _ in range(512)]
    blake2s(cs, input_bits, PERSON)
    assert cs.num_constraints() == 0


def test_against_hashlib():
    for length in (0, 1, 31, 32, 63, 64, 65, 96, 127, 128):
        data = bytes(RNG.randrange(256) for _ in range(length))
        expected = hashlib.blake2s(data, digest_size=32, person=PERSON).digest()
        cs = TestConstraintSystem()
        got = gadget_blake2s(cs, data)
        assert cs.is_satisfied()
        assert got == expected, f"len={length}"


def test_personalization_changes_digest():
    data = b"hello world, this is a blake2s t"
    cs1 = TestConstraintSystem()
    d1 = gadget_blake2s(cs1, data, b"12345678")
    cs2 = TestConstraintSystem()
    d2 = gadget_blake2s(cs2, data, b"87654321")
    assert d1 != d2
    assert d2 == hashlib.blake2s(data, digest_size=32, person=b"87654321").digest()
