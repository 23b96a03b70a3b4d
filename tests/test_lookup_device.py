"""Lookup gadgets on the device witness path (VERDICT r2 item 2).

The reference computes lookup witnesses inside value closures
(lookup.rs:55-66, 137-150) so every backend can produce them; here the
gadgets record a `lookup` tape op (an [2^k, 16]-limb table gather per op)
so the compiled device witness program covers EC-window circuits
end-to-end: free bits -> device witness -> templated check, with zero
free non-input slots."""

import random

import numpy as np

from bellpepper_tpu import SCALAR, TestConstraintSystem, WitnessCS
from bellpepper_tpu.backend.matvec import TemplatedSatisfier
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.lookup import (
    lookup3_xy,
    lookup3_xy_with_conditional_negation,
)
from bellpepper_tpu.r1cs import ShapeCS

RNG = random.Random(0x5962BE3D)
P = SCALAR.p

COORDS8 = [(RNG.randrange(P), RNG.randrange(P)) for _ in range(8)]
COORDS8B = [(RNG.randrange(P), RNG.randrange(P)) for _ in range(8)]
COORDS4 = [(RNG.randrange(P), RNG.randrange(P)) for _ in range(4)]


def _bits(cs, inst, n):
    return [
        Boolean.from_bit(
            AllocatedBit.alloc(
                cs.namespace(f"b{i}"), None if inst is None else inst[i]
            )
        )
        for i in range(n)
    ]


def window_circuit(cs, inst=None):
    """Two 3-bit XY windows + one conditional-negation window, mixed with
    field ops consuming the looked-up values (an EC-window-style shape)."""
    bits = _bits(cs, inst, 9)
    x1, y1 = lookup3_xy(cs.namespace("w1"), bits[0:3], COORDS8)
    x2, y2 = lookup3_xy(cs.namespace("w2"), bits[3:6], COORDS8B)
    _xn, yn = lookup3_xy_with_conditional_negation(
        cs.namespace("w3"), bits[6:9], COORDS4
    )
    t = x1.mul(cs.namespace("m1"), y2)
    u = t.add(cs.namespace("a1"), x2)
    u.mul(cs.namespace("m2"), y1)


def _compare_program(circuit, n_bits, B=8):
    tape = TapeCS()
    circuit(tape, None)
    prog = WitnessProgram(tape)
    # All non-input slots must be produced on device: the only free slots
    # are the allocated input bits.
    assert len(prog.free_slots) == n_bits
    assert not prog.free_field_slots

    insts = [[RNG.random() < 0.5 for _ in range(n_bits)] for _ in range(B)]
    free = np.array([[int(v) for v in i] for i in insts], np.uint32)
    vals, flimbs = prog.run(free)
    z = np.asarray(prog.z_template_limbs(vals, flimbs))

    for b, inst in enumerate(insts):
        w = WitnessCS()
        circuit(w, inst)
        expect = w.inputs_slice() + w.aux_slice()
        got = [
            int(sum(int(z[b, s, l]) << (16 * l) for l in range(16)))
            for s in range(prog.num_slots)
        ]
        assert got == expect, f"instance {b} mismatch"
    return prog, z


def test_lookup3_xy_device_program():
    def circuit(cs, inst):
        bits = _bits(cs, inst, 3)
        lookup3_xy(cs.namespace("w"), bits, COORDS8)

    _compare_program(circuit, 3)


def test_lookup3_cn_device_program():
    def circuit(cs, inst):
        bits = _bits(cs, inst, 3)
        lookup3_xy_with_conditional_negation(cs.namespace("w"), bits, COORDS4)

    _compare_program(circuit, 3)


def test_lookup_constant_bit_views():
    """Constant and negated index bits must fold into the device gather."""

    def circuit(cs, inst):
        bits = _bits(cs, inst, 2)
        sel = [bits[0].not_(), Boolean.constant(True), bits[1]]
        lookup3_xy(cs.namespace("w"), sel, COORDS8)

    _compare_program(circuit, 2)


def test_lookup_window_full_production_path():
    """free bits -> device witness -> templated limbs check, verdict and
    corruption detection agreeing with the TestConstraintSystem oracle."""
    shape = ShapeCS()
    window_circuit(shape)
    template = shape.finish()

    prog, z = _compare_program(window_circuit, 9, B=8)

    sat = TemplatedSatisfier(template, batch=8, witness_form="limbs")
    assert sat.is_satisfied(z)

    # Host oracle satisfied too.
    inst = [RNG.random() < 0.5 for _ in range(9)]
    cs = TestConstraintSystem()
    window_circuit(cs, inst)
    assert cs.is_satisfied()

    # Corrupt one looked-up coordinate in one instance -> detected, and the
    # named constraint agrees with the host oracle under the same mutation.
    cs.set("w1/x/num", (cs.get("w1/x/num") + 1) % P)
    host_failed = cs.which_is_unsatisfied()
    assert host_failed is not None

    zbad = z.copy()
    # Locate w1/x's slot in the template column space by value, then bump
    # its low limb in one instance.
    tc = TestConstraintSystem()
    window_circuit(tc, inst)
    target_val = tc.get("w1/x/num")
    full = [1] + tc.scalar_inputs()[1:] + tc.scalar_aux()
    slot = full.index(target_val)
    zbad[0, slot, 0] = (int(zbad[0, slot, 0]) + 1) % (1 << 16)
    assert not sat.is_satisfied(zbad)
    failed = sat.which_is_unsatisfied(zbad)
    assert failed is not None
