"""Native (C++) synthesis core parity tests: the builder must produce
the SAME R1CS (COO arrays + coefficients) and an equivalent witness tape
as the Python gadget path, for boolean ops, addmany, and full sha256 /
blake2s compressions."""

import random

import numpy as np
import pytest

from bellpepper_tpu import SCALAR, WitnessCS
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multieq import MultiEq
from bellpepper_tpu.gadgets.sha256 import get_sha256_iv, sha256_compression_function
from bellpepper_tpu.gadgets.uint32 import UInt32
from bellpepper_tpu.native import NativeBuilder
from bellpepper_tpu.r1cs import ShapeCS

RNG = random.Random(0x5962BE3D)


def assert_r1cs_equal(r_native, r_python):
    assert r_native.num_inputs == r_python.num_inputs
    assert r_native.num_aux == r_python.num_aux
    assert r_native.num_constraints == r_python.num_constraints
    for m in ("a", "b", "c"):
        mine = getattr(r_native, m)
        theirs = getattr(r_python, m)
        assert (mine.rows == theirs.rows).all(), m
        assert (mine.cols == theirs.cols).all(), m
        got = [r_native.coeff_table[i] for i in mine.coeff_ids]
        want = [r_python.coeff_table[i] for i in theirs.coeff_ids]
        assert got == want, m


def test_native_boolean_ops_match():
    nb = NativeBuilder()
    a = nb.alloc_bit()
    b = nb.alloc_bit()
    x = nb.xor(a, b)
    y = nb.and_(x, nb.not_(a))
    z = nb.and_(nb.not_(a), nb.not_(b))  # nor
    ch = nb.ch(y, z, b)
    nb.maj(ch, a, nb.not_(x))
    r_native, _tape = nb.finish()

    cs = ShapeCS()
    ab = Boolean.from_bit(AllocatedBit.alloc(cs, None))
    bb = Boolean.from_bit(AllocatedBit.alloc(cs, None))
    xb = Boolean.xor(cs, ab, bb)
    yb = Boolean.and_(cs, xb, ab.not_())
    zb = Boolean.and_(cs, ab.not_(), bb.not_())
    chb = Boolean.sha256_ch(cs, yb, zb, bb)
    Boolean.sha256_maj(cs, chb, ab, xb.not_())
    assert_r1cs_equal(r_native, cs.finish())


def test_native_addmany_matches():
    nb = NativeBuilder()
    words = [[nb.alloc_bit() for _ in range(32)] for _ in range(3)]
    nb.multieq_begin()
    nb.addmany(words)
    nb.multieq_end()
    r_native, _ = nb.finish()

    cs = ShapeCS()
    ops = [UInt32.alloc(cs, None) for _ in range(3)]
    with MultiEq(cs) as mcs:
        UInt32.addmany(mcs.namespace("x"), ops)
    assert_r1cs_equal(r_native, cs.finish())


def test_native_sha256_compression_matches():
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    r_native, tape = nb.finish()

    cs = ShapeCS()
    input_bits = [Boolean.from_bit(AllocatedBit.alloc(cs, None)) for _ in range(512)]
    sha256_compression_function(cs, input_bits, get_sha256_iv())
    r_py = cs.finish()
    assert r_native.num_constraints == 512 + 25840  # pinned oracle
    assert_r1cs_equal(r_native, r_py)

    # The native tape must drive the witness program to the same values
    # as host WitnessCS synthesis.
    prog = WitnessProgram(tape)
    assert prog.is_pure_bits
    bits = [RNG.random() < 0.5 for _ in range(512)]
    vals, _f = prog.run(np.asarray([[int(b) for b in bits]], np.uint32))
    w = WitnessCS()
    wb = [Boolean.from_bit(AllocatedBit.alloc(w, v)) for v in bits]
    sha256_compression_function(w, wb, get_sha256_iv())
    expect = w.inputs_slice() + w.aux_slice()
    got = [int(v) for v in np.asarray(vals[0])]
    assert got == expect


def test_native_blake2s_compression_matches():
    from bellpepper_tpu.gadgets.blake2s import blake2s_compression

    nb = NativeBuilder()
    m = [nb.alloc_bit() for _ in range(512)]
    # initial h for blake2s-256, person=b"12345678"
    import struct

    p_lo = int.from_bytes(b"1234", "little")
    p_hi = int.from_bytes(b"5678", "little")
    h_words = [
        0x6A09E667 ^ 0x01010000 ^ 32,
        0xBB67AE85,
        0x3C6EF372,
        0xA54FF53A,
        0x510E527F,
        0x9B05688C,
        0x1F83D9AB ^ p_lo,
        0x5BE0CD19 ^ p_hi,
    ]
    h = []
    for wv in h_words:
        for i in range(32):
            h.append(nb.constant(bool((wv >> i) & 1)))
    nb.blake2s_compression(h, m, 64, True)
    r_native, _ = nb.finish()

    cs = ShapeCS()
    from bellpepper_tpu.gadgets.uint32 import UInt32 as U32

    hw = [U32.constant(wv) for wv in h_words]
    mb = [
        U32.from_bits(
            [Boolean.from_bit(AllocatedBit.alloc(cs, None)) for _ in range(32)]
        )
        for _ in range(16)
    ]
    blake2s_compression(cs, hw, mb, 64, True)
    assert_r1cs_equal(r_native, cs.finish())


def test_native_sha256_speed():
    """Native synthesis should be dramatically faster than Python."""
    import time

    t0 = time.time()
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    state = nb.sha256_iv()
    for _ in range(4):  # 4-block chain
        state = nb.sha256_compression(in_bits[:256] + state[:256], state)
    nb.finish()
    t_native = time.time() - t0
    # Generous bound (runs ~0.1s alone) to stay robust when the suite
    # shares the machine with JAX compiles.
    assert t_native < 10.0, f"native synthesis too slow: {t_native:.2f}s"


def test_native_field_ops_match():
    """AllocatedNum family: native synthesis must produce the same R1CS
    and a working witness tape for a config-1-shaped field circuit
    (pack bits -> mul/add/square chain -> assert_nonzero)."""
    import jax.numpy as jnp

    from bellpepper_tpu.gadgets.multipack import pack_bits
    from bellpepper_tpu.gadgets.num import AllocatedNum

    n_bits = 16

    # native
    nb = NativeBuilder()
    bits = [nb.alloc_bit() for _ in range(2 * n_bits)]
    a = nb.pack_bits(bits[:n_bits])
    b = nb.pack_bits(bits[n_bits:])
    x = a
    for _ in range(6):
        x = nb.num_mul(x, b)
        x = nb.num_add(x, a)
        x = nb.num_square(x)
    nb.num_assert_nonzero(x)
    r_native, tape = nb.finish()

    # python
    def circuit(cs, vals=None):
        bs = [
            Boolean.from_bit(
                AllocatedBit.alloc(
                    cs.namespace(f"b{i}"), None if vals is None else vals[i]
                )
            )
            for i in range(2 * n_bits)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:n_bits])
        b = pack_bits(cs.namespace("pb"), bs[n_bits:])
        x = a
        for i in range(6):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"s{i}"), a)
            x = x.square(cs.namespace(f"q{i}"))
        x.assert_nonzero(cs.namespace("nz"))

    cs = ShapeCS()
    circuit(cs)
    r_python = cs.finish()
    assert_r1cs_equal(r_native, r_python)

    # native tape drives the witness program; result satisfies the R1CS
    # and matches the Python TestConstraintSystem witness bit-exactly.
    from bellpepper_tpu import TestConstraintSystem
    from bellpepper_tpu.backend.matvec import TemplatedSatisfier

    prog = WitnessProgram(tape)
    rng = np.random.default_rng(12)
    B = 2
    free = rng.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vals, flimbs = prog.run(jnp.asarray(free))
    z3 = prog.z_template_limbs(vals, flimbs)
    sat = TemplatedSatisfier(r_native, B, use_pallas=False, witness_form="limbs")
    assert sat.is_satisfied(sat.z_from_instances(z3))

    tcs = TestConstraintSystem()
    circuit(tcs, [bool(v) for v in free[0]])
    assert tcs.is_satisfied()
    host = [1] + tcs.scalar_aux()
    z0 = np.asarray(z3)[0]
    dev = [
        sum(int(z0[s, l]) << (16 * l) for l in range(16))
        for s in range(z0.shape[0])
    ]
    assert dev == host
