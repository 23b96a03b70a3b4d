"""SHA-256 circuit tests: pinned constraint counts (the structural
oracles 25,840 / 44,874), blank-hash digest, and cross-checks against
hashlib over many lengths — mirroring sha256.rs:284-417."""

import hashlib
import os
import random

import pytest

from bellpepper_tpu import TestConstraintSystem
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.sha256 import (
    get_sha256_iv,
    sha256,
    sha256_compression_function,
)

RNG = random.Random(0x5962BE3D)


def bits_to_bytes_be(bits):
    return bytes(
        sum(int(bits[i * 8 + j]) << (7 - j) for j in range(8))
        for i in range(len(bits) // 8)
    )


def test_blank_hash():
    cs = TestConstraintSystem()
    input_bits = [Boolean.constant(False)] * 512
    input_bits[0] = Boolean.constant(True)
    out = sha256_compression_function(cs, input_bits, get_sha256_iv())
    assert cs.is_satisfied()
    assert cs.num_constraints() == 0  # constants fold entirely

    out_bits = [b.get_value() for w in out for b in w.into_bits_be()]
    assert (
        bits_to_bytes_be(out_bits).hex()
        == "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )


def test_full_block_constraint_count():
    cs = TestConstraintSystem()
    input_bits = [
        Boolean.from_bit(
            AllocatedBit.alloc(cs.namespace(f"input bit {i}"), RNG.random() < 0.5)
        )
        for i in range(512)
    ]
    sha256_compression_function(cs.namespace("sha256"), input_bits, get_sha256_iv())
    assert cs.is_satisfied()
    assert cs.num_constraints() - 512 == 25840


def test_full_hash_constraint_count():
    cs = TestConstraintSystem()
    input_bits = [
        Boolean.from_bit(
            AllocatedBit.alloc(cs.namespace(f"input bit {i}"), RNG.random() < 0.5)
        )
        for i in range(512)
    ]
    sha256(cs.namespace("sha256"), input_bits)
    assert cs.is_satisfied()
    assert cs.num_constraints() - 512 == 44874


def _check_sha256_vector(input_len: int) -> None:
    data = bytes(RNG.randrange(256) for _ in range(input_len))
    expected = hashlib.sha256(data).digest()

    cs = TestConstraintSystem()
    input_bits = []
    for byte_i, byte in enumerate(data):
        for bit_i in range(7, -1, -1):
            input_bits.append(
                Boolean.from_bit(
                    AllocatedBit.alloc(
                        cs.namespace(f"input bit {byte_i} {bit_i}"),
                        bool((byte >> bit_i) & 1),
                    )
                )
            )

    out = sha256(cs, input_bits)
    assert cs.is_satisfied()
    got = [b.get_value() for b in out]
    assert bits_to_bytes_be(got) == expected, f"len={input_len}"


def test_against_vectors():
    # Lengths 0..32 bytes plus multiples of 8 up to 64; the reference's
    # full 32..256-step-8 sweep (sha256.rs:364-417) runs in
    # test_sha256_extended below (slow; gated on BP_SLOW_TESTS=1).
    for input_len in list(range(0, 32)) + [40, 48, 56, 64]:
        _check_sha256_vector(input_len)


@pytest.mark.skipif(
    not os.environ.get("BP_SLOW_TESTS"),
    reason="full 32..256-step-8 sweep takes minutes on host; set "
    "BP_SLOW_TESTS=1 to run (reference sweep: sha256.rs:364-417)",
)
def test_sha256_extended():
    for input_len in range(32, 256, 8):
        _check_sha256_vector(input_len)


def test_mutation_kills_satisfiability():
    cs = TestConstraintSystem()
    input_bits = [
        Boolean.from_bit(
            AllocatedBit.alloc(cs.namespace(f"input bit {i}"), RNG.random() < 0.5)
        )
        for i in range(512)
    ]
    sha256_compression_function(cs.namespace("sha256"), input_bits, get_sha256_iv())
    assert cs.is_satisfied()
    # Corrupt one addmany result bit deep inside the schedule.
    path = "sha256/w extension 16/computation of w[i]/result bit 3/boolean"
    cs.set(path, 1 - cs.get(path))
    assert not cs.is_satisfied()
