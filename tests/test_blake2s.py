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


def test_blake2s_256_vars_reference_vector():
    """The reference's pinned 256-byte fixture (blake2s.rs:559-607):
    gadget digest must equal the hex expected there (also cross-checked
    against hashlib at build time — the data/digest are public blake2s
    test vectors, not code)."""
    data = bytes.fromhex(
        "be9f9c485e670acce8b1516a378176161b20583637b6f1c536fbc1158a0a3296"
        "831df2920e57a442d5738f4be4dd6be89dd7913fc8b4d1c0a815646a4d674b77"
        "f7caf313bd880bf759fcac27037c48c2b2a20acd2fd5248e3be426c84a341c0a"
        "3c63eaf36e0d537d10b8db5c6e4c801832c41eb1a3ed602177acded8b4b803bd"
        "34339d99a18b71df399641cc8dfae2ad193fcd74b5913e704551777160d14c78"
        "f2e8d5c32716a8599c1080cb89a40ccd6ba596694a8b4a065d9f2d0667ef423e"
        "d2e418093caff884540858b4f4b62acd47edcea880523e1b1cda8eb225c128c2"
        "e9e83f14f6e7448c5733a195cac7d79a53dde5083172462c45b2f799e42af1c9"
    )
    assert len(data) == 256
    expected = "0af5695115ced92c8a0341e43869209636e9aa6472e4576f0f2b996cf812b30e"
    assert hashlib.blake2s(data, person=PERSON).hexdigest() == expected
    cs = TestConstraintSystem()
    got = gadget_blake2s(cs, data)
    assert cs.is_satisfied()
    assert got.hex() == expected
