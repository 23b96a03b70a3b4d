"""End-to-end over the pasta fields (the production Nova/Lurk fields):
gadget synthesis, satisfiability and witness programs must work for
PALLAS_SCALAR / VESTA_SCALAR exactly like BLS12-381 Fr."""

import random

import numpy as np
import pytest

from bellpepper_tpu import (
    PALLAS_SCALAR,
    VESTA_SCALAR,
    TestConstraintSystem,
    WitnessCS,
)
from bellpepper_tpu.backend.matvec import Satisfier, TemplatedSatisfier
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multieq import MultiEq
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.gadgets.sha256 import get_sha256_iv, sha256_compression_function
from bellpepper_tpu.gadgets.uint32 import UInt32
from bellpepper_tpu.r1cs import R1CS, ShapeCS

RNG = random.Random(0x5962BE3D)


@pytest.mark.parametrize("field", [PALLAS_SCALAR, VESTA_SCALAR], ids=lambda f: f.name)
def test_pasta_num_circuit_device_check(field):
    cs = TestConstraintSystem(field)
    a = AllocatedNum.alloc(cs.namespace("a"), RNG.randrange(field.p))
    b = AllocatedNum.alloc(cs.namespace("b"), RNG.randrange(field.p))
    c = a.mul(cs.namespace("c"), b)
    d = c.add(cs.namespace("d"), a)
    d.assert_nonzero(cs.namespace("nz"))
    assert cs.is_satisfied()

    sat = Satisfier(R1CS.from_test_cs(cs), use_pallas=False)
    z = sat.z_from_assignments(cs.scalar_inputs(), cs.scalar_aux())
    assert sat.is_satisfied(z)

    aux = cs.scalar_aux()
    aux[0] = (aux[0] + 1) % field.p
    zb = sat.z_from_assignments(cs.scalar_inputs(), aux)
    assert sat.which_is_unsatisfied(zb) is not None


def test_pasta_sha256_counts_and_witness_program():
    """Constraint counts are CAPACITY-dependent; pasta fields share
    CAPACITY=254 with BLS12-381 Fr, so the pinned sha256 count holds."""
    field = PALLAS_SCALAR
    shape = ShapeCS(field)
    bits = [Boolean.from_bit(AllocatedBit.alloc(shape, None)) for _ in range(512)]
    sha256_compression_function(shape, bits, get_sha256_iv())
    template = shape.finish()
    assert template.num_constraints == 512 + 25840

    tape = TapeCS(field)
    bits = [Boolean.from_bit(AllocatedBit.alloc(tape, None)) for _ in range(512)]
    sha256_compression_function(tape, bits, get_sha256_iv())
    prog = WitnessProgram(tape)

    B = 2
    free = np.array(
        [[RNG.randrange(2) for _ in range(512)] for _ in range(B)], np.uint32
    )
    vals, _ = prog.run(free)

    # host oracle
    w = WitnessCS(field)
    wb = [
        Boolean.from_bit(AllocatedBit.alloc(w, bool(free[0][i])))
        for i in range(512)
    ]
    sha256_compression_function(w, wb, get_sha256_iv())
    expect = w.inputs_slice() + w.aux_slice()
    assert [int(v) for v in np.asarray(vals[0])] == expect

    sat = TemplatedSatisfier(template, B, use_pallas=False, witness_form="bits")
    assert sat.is_satisfied(vals)


def test_pasta_native_builder():
    from bellpepper_tpu.native import NativeBuilder

    nb = NativeBuilder(PALLAS_SCALAR)
    a = nb.alloc_bit()
    b = nb.alloc_bit()
    nb.multieq_begin()
    nb.addmany([[a] * 32, [b] * 32])
    nb.multieq_end()
    r_native, _ = nb.finish()

    cs = ShapeCS(PALLAS_SCALAR)
    ab = Boolean.from_bit(AllocatedBit.alloc(cs, None))
    bb = Boolean.from_bit(AllocatedBit.alloc(cs, None))
    u1 = UInt32([ab] * 32, None)
    u2 = UInt32([bb] * 32, None)
    with MultiEq(cs) as mcs:
        UInt32.addmany(mcs.namespace("x"), [u1, u2])
    r_py = cs.finish()
    assert r_native.num_constraints == r_py.num_constraints
    for m in ("a", "b", "c"):
        got = [r_native.coeff_table[i] for i in getattr(r_native, m).coeff_ids]
        want = [r_py.coeff_table[i] for i in getattr(r_py, m).coeff_ids]
        assert got == want
