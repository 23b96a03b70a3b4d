"""Witness tape → device program tests: the vectorized generator must
reproduce WitnessCS (the host closure path) bit-exactly, per instance."""

import random

import numpy as np

from bellpepper_tpu import SCALAR, WitnessCS
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multieq import MultiEq
from bellpepper_tpu.gadgets.multipack import pack_into_inputs
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.gadgets.uint32 import UInt32

RNG = random.Random(0x5962BE3D)
P = SCALAR.p


def run_program_and_compare(circuit, instances, free_of_instance):
    """Record tape once, evaluate B instances, compare each against
    WitnessCS synthesis."""
    tape = TapeCS()
    circuit(tape, None)
    prog = WitnessProgram(tape)

    free = np.array(
        [free_of_instance(inst) for inst in instances], dtype=np.uint32
    )
    vals, flimbs = prog.run(free)
    z = np.asarray(prog.z_template_limbs(vals, flimbs))

    for b, inst in enumerate(instances):
        w = WitnessCS()
        circuit(w, inst)
        expect = w.inputs_slice() + w.aux_slice()
        got = [
            int(sum(int(z[b, s, l]) << (16 * l) for l in range(16)))
            for s in range(prog.num_slots)
        ]
        assert got == expect, f"instance {b} mismatch"
    return prog


def test_bit_ops_program():
    def circuit(cs, inst):
        bits = [
            Boolean.from_bit(
                AllocatedBit.alloc(cs.namespace(f"b{i}"), None if inst is None else inst[i])
            )
            for i in range(8)
        ]
        x = Boolean.xor(cs.namespace("x"), bits[0], bits[1])
        y = Boolean.and_(cs.namespace("y"), x, bits[2].not_())  # and_not path
        z = Boolean.and_(cs.namespace("z"), bits[3].not_(), bits[4].not_())  # nor
        ch = Boolean.sha256_ch(cs.namespace("ch"), y, z, bits[5])
        Boolean.sha256_maj(cs.namespace("maj"), ch, bits[6], bits[7].not_())

    instances = [[RNG.random() < 0.5 for _ in range(8)] for _ in range(8)]
    run_program_and_compare(
        circuit, instances, lambda inst: [int(v) for v in inst]
    )


def test_uint32_addmany_program():
    def circuit(cs, inst):
        ops = [
            UInt32.alloc(cs.namespace(f"op {i}"), None if inst is None else inst[i])
            for i in range(4)
        ]
        with MultiEq(cs) as mcs:
            s = UInt32.addmany(mcs.namespace("add"), ops)
            t = s.xor(mcs.namespace("xor"), ops[0].rotr(7))
            UInt32.addmany(mcs.namespace("add2"), [t, ops[1].shr(3)])

    instances = [[RNG.randrange(1 << 32) for _ in range(4)] for _ in range(4)]

    def free_of(inst):
        return [int((v >> i) & 1) for v in inst for i in range(32)]

    run_program_and_compare(circuit, instances, free_of)


def test_field_ops_program():
    def circuit(cs, inst):
        # Free field inputs enter as bits via pack (device-representable).
        bits = [
            Boolean.from_bit(
                AllocatedBit.alloc(
                    cs.namespace(f"b{i}"), None if inst is None else inst[i]
                )
            )
            for i in range(64)
        ]
        from bellpepper_tpu.gadgets.multipack import pack_bits

        a = pack_bits(cs.namespace("pa"), bits[:32])
        b = pack_bits(cs.namespace("pb"), bits[32:])
        c = a.mul(cs.namespace("mul"), b)
        d = c.add(cs.namespace("add"), a)
        e = d.square(cs.namespace("sq"))
        e.assert_nonzero(cs.namespace("nz"))
        cond = bits[0]
        AllocatedNum.conditionally_reverse(cs.namespace("rev"), a, b, cond)
        e.inputize(cs.namespace("out"))

    instances = [[RNG.random() < 0.5 for _ in range(64)] for _ in range(4)]
    # ensure nonzero: force a low bit set
    for inst in instances:
        inst[1] = True
        inst[33] = True
    run_program_and_compare(
        circuit, instances, lambda inst: [int(v) for v in inst]
    )


def test_multipack_program():
    def circuit(cs, inst):
        bits = [
            Boolean.from_bit(
                AllocatedBit.alloc(
                    cs.namespace(f"b{i}"), None if inst is None else inst[i]
                )
            )
            for i in range(300)
        ]
        pack_into_inputs(cs.namespace("pack"), bits)

    instances = [[RNG.random() < 0.5 for _ in range(300)] for _ in range(3)]
    run_program_and_compare(
        circuit, instances, lambda inst: [int(v) for v in inst]
    )


def test_sha256_program_small():
    """One compression block (the flagship op), 2 instances."""
    from bellpepper_tpu.gadgets.sha256 import (
        get_sha256_iv,
        sha256_compression_function,
    )

    def circuit(cs, inst):
        input_bits = [
            Boolean.from_bit(
                AllocatedBit.alloc(
                    cs.namespace(f"b{i}"), None if inst is None else inst[i]
                )
            )
            for i in range(512)
        ]
        sha256_compression_function(cs.namespace("sha"), input_bits, get_sha256_iv())

    instances = [[RNG.random() < 0.5 for _ in range(512)] for _ in range(2)]
    prog = run_program_and_compare(
        circuit, instances, lambda inst: [int(v) for v in inst]
    )
    assert prog.n_field_rows == 0  # pure u32 program
    assert len(prog.free_slots) == 512


def test_deep_field_chain_uses_scan_and_matches_host():
    """A 30-level mul/add/square/select/inv chain: the compiled program
    must fold the field stages into a lax.scan run (compile-time fix for
    deep chains) and still reproduce the host TestConstraintSystem values
    bit-exactly."""
    import numpy as np
    import jax.numpy as jnp

    from bellpepper_tpu import SCALAR, TestConstraintSystem
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import SCAN_OPS, WitnessProgram
    from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
    from bellpepper_tpu.gadgets.multipack import pack_bits
    from bellpepper_tpu.gadgets.num import AllocatedNum

    def circuit(cs, bits=None):
        bs = [
            Boolean.from_bit(
                AllocatedBit.alloc(
                    cs.namespace(f"b{i}"), None if bits is None else bits[i]
                )
            )
            for i in range(16)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:8])
        b = pack_bits(cs.namespace("pb"), bs[8:])
        x = a
        for i in range(10):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"s{i}"), a)
            x = x.square(cs.namespace(f"q{i}"))
        return x

    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    n_scan = sum(1 for st in prog.stages if st.opcode in SCAN_OPS)
    assert n_scan >= 30  # the chain is scan-eligible

    rng = np.random.default_rng(23)
    B = 4
    free = rng.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vals, flimbs = prog.run(jnp.asarray(free))
    z3 = np.asarray(prog.z_template_limbs(vals, flimbs))

    # Host oracle for each instance.
    for bi in range(B):
        cs = TestConstraintSystem()
        circuit(cs, [bool(v) for v in free[bi]])
        assert cs.is_satisfied()
        host = [1] + cs.scalar_aux()
        dev = [
            sum(int(z3[bi, s, l]) << (16 * l) for l in range(16))
            for s in range(z3.shape[1])
        ]
        assert dev == host
