"""Periodic-pattern scan folding in WitnessProgram.build: sequential
field chains (e.g. mul/add/square) scan over pattern repetitions with
statically-typed op bodies instead of a per-step lax.switch."""

import numpy as np
import pytest

import jax.numpy as jnp

from bellpepper_tpu.backend.matvec import TemplatedSatisfier
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram, _find_period
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multipack import pack_bits
from bellpepper_tpu.r1cs import ShapeCS


def test_find_period():
    assert _find_period(["fmul", "fadd", "fmul"] * 10) == 3
    assert _find_period(["fmul"] * 8) == 1
    assert _find_period(["fadd", "fmul", "copy", "select", "fadd"]) == 5
    # finv only foldable alone (its Fermat ladder would inline d times)
    assert _find_period(["fmul", "finv"] * 4) is None
    assert _find_period(["finv"] * 6) == 1
    # aperiodic beyond MAX_PATTERN
    assert _find_period(["fmul"] * 9 + ["fadd"] * 9) is None


def _chain_circuit(cs, rounds):
    bs = [
        Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
        for i in range(128)
    ]
    a = pack_bits(cs.namespace("pa"), bs[:64])
    b = pack_bits(cs.namespace("pb"), bs[64:])
    x = a
    for i in range(rounds):
        x = x.mul(cs.namespace(f"m{i}"), b)
        x = x.add(cs.namespace(f"a{i}"), a)
        x = x.square(cs.namespace(f"s{i}"))


@pytest.mark.parametrize("rounds", [2, 10])
def test_periodic_chain_end_to_end(rounds):
    shape = ShapeCS()
    _chain_circuit(shape, rounds)
    template = shape.finish()
    tape = TapeCS()
    _chain_circuit(tape, rounds)
    prog = WitnessProgram(tape)
    ev = prog.build(use_pallas=False)
    rng = np.random.default_rng(3)
    B = 4
    fb = jnp.asarray(rng.integers(0, 2, size=(B, 128)).astype(np.uint32))
    ff = jnp.zeros((B, max(len(prog.free_field_slots), 1), 16), jnp.uint32)
    vals, fl = ev(fb, ff)
    z = prog.z_template_limbs(vals, fl, ff)
    sat = TemplatedSatisfier(template, B, use_pallas=False, witness_form="limbs")
    assert sat.is_satisfied(z)
    zbad = z.at[1, 5, 0].set(z[1, 5, 0] ^ 1)
    assert not sat.is_satisfied(zbad)
