#!/usr/bin/env python
"""BASELINE configs 1-3:

  1. AllocatedNum mul/add circuit: synthesize + witness + is_satisfied
     (the CPU-runnable reference config) — generic limbs path.
  2. Boolean/UInt32 bitwise circuit (xor, rotr, addmany) with enforced
     packing — templated bits path.
  3. multipack + multieq batched equality circuit at 2^16 constraints.

Prints one JSON line per config."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import random
import time

import numpy as np


def bench_loop(check, arg, n=10):
    ab, _ = check(arg)
    _ = bool(ab)
    t0 = time.time()
    acc = None
    for _i in range(n):
        ab, _f = check(arg)
        acc = ab if acc is None else (acc | ab)
    bad = bool(acc)
    return (time.time() - t0) / n, bad


def config1():
    import jax.numpy as jnp

    from bellpepper_tpu import WitnessCS
    from bellpepper_tpu.backend.matvec import TemplatedSatisfier
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
    from bellpepper_tpu.gadgets.multipack import pack_bits
    from bellpepper_tpu.gadgets.num import AllocatedNum
    from bellpepper_tpu.r1cs import ShapeCS

    rng = random.Random(5)

    def circuit(cs, bits=None):
        # field inputs enter as packed bits so the witness program can
        # generate them on device.
        bs = [
            Boolean.from_bit(
                AllocatedBit.alloc(
                    cs.namespace(f"b{i}"), None if bits is None else bits[i]
                )
            )
            for i in range(128)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:64])
        b = pack_bits(cs.namespace("pb"), bs[64:])
        x = a
        for i in range(30):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"a{i}"), a)
            x = x.square(cs.namespace(f"s{i}"))

    t0 = time.time()
    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    t_synth = time.time() - t0

    B = 512
    sat = TemplatedSatisfier(template, B, witness_form="limbs")
    free = np.random.default_rng(5).integers(0, 2, size=(B, 128)).astype(np.uint32)
    free_d = jnp.asarray(free)
    # Warm (deep sequential field-op chains compile slowly on the remote
    # compiler — a known limitation recorded in BASELINE.md), then measure.
    vals, flimbs = prog.run(free_d)
    z3 = prog.z_template_limbs(vals, flimbs)
    _ = int(jnp.sum(z3[0, 0, :1]))
    t0 = time.time()
    vals, flimbs = prog.run(free_d)
    z3 = prog.z_template_limbs(vals, flimbs)
    _ = int(jnp.sum(z3[0, 0, :1]))
    t_wit = time.time() - t0
    t_check, bad = bench_loop(sat._check, z3)
    total = B * template.num_constraints
    print(
        json.dumps(
            {
                "metric": "config1 AllocatedNum mul/add constraint-evals/s",
                "value": round(total / t_check, 1),
                "unit": "constraints/s",
                "detail": {
                    "constraints": total,
                    "satisfied": not bad,
                    "witness_s": round(t_wit, 4),
                    "synthesis_s": round(t_synth, 3),
                },
            }
        )
    )
    assert not bad


def config2():
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import TemplatedSatisfier
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.multieq import MultiEq
    from bellpepper_tpu.gadgets.multipack import pack_into_inputs
    from bellpepper_tpu.gadgets.uint32 import UInt32
    from bellpepper_tpu.r1cs import ShapeCS

    def circuit(cs):
        ops = [UInt32.alloc(cs.namespace(f"op {i}"), None) for i in range(8)]
        with MultiEq(cs) as mcs:
            x = ops[0]
            for i in range(1, 8):
                x = x.xor(mcs.namespace(f"x{i}"), ops[i].rotr(5 * i))
                x = UInt32.addmany(mcs.namespace(f"s{i}"), [x, ops[i - 1].shr(3)])

    t0 = time.time()
    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    t_synth = time.time() - t0
    assert prog.is_pure_bits

    B = 2048
    sat = TemplatedSatisfier(template, B, witness_form="bits")
    free = np.random.default_rng(6).integers(
        0, 2, size=(B, len(prog.free_slots))
    ).astype(np.uint32)
    t0 = time.time()
    vals, _ = prog.run(jnp.asarray(free))
    _ = int(jnp.sum(vals[0, :4]))
    t_wit = time.time() - t0
    t_check, bad = bench_loop(sat._check, vals)
    total = B * template.num_constraints
    print(
        json.dumps(
            {
                "metric": "config2 UInt32 bitwise constraint-evals/s",
                "value": round(total / t_check, 1),
                "unit": "constraints/s",
                "detail": {
                    "constraints": total,
                    "satisfied": not bad,
                    "witness_s": round(t_wit, 4),
                    "synthesis_s": round(t_synth, 3),
                },
            }
        )
    )
    assert not bad


def config3():
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import TemplatedSatisfier
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
    from bellpepper_tpu.gadgets.multieq import MultiEq
    from bellpepper_tpu.gadgets.uint32 import UInt32
    from bellpepper_tpu.r1cs import ShapeCS

    # multieq-batched equalities + packing; template sized so the batch
    # reaches 2^16 constraints.
    def circuit(cs):
        words = [UInt32.alloc(cs.namespace(f"w{i}"), None) for i in range(4)]
        with MultiEq(cs) as mcs:
            acc = words[0]
            for i in range(1, 4):
                acc = UInt32.addmany(mcs.namespace(f"add {i}"), [acc, words[i]])

    t0 = time.time()
    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    t_synth = time.time() - t0

    B = max(1, (1 << 16) // template.num_constraints)
    sat = TemplatedSatisfier(template, B, witness_form="bits")
    free = np.random.default_rng(7).integers(
        0, 2, size=(B, len(prog.free_slots))
    ).astype(np.uint32)
    vals, _ = prog.run(jnp.asarray(free))
    t_check, bad = bench_loop(sat._check, vals)
    total = B * template.num_constraints
    print(
        json.dumps(
            {
                "metric": "config3 multipack/multieq constraint-evals/s",
                "value": round(total / t_check, 1),
                "unit": "constraints/s",
                "detail": {
                    "constraints": total,
                    "satisfied": not bad,
                    "synthesis_s": round(t_synth, 3),
                },
            }
        )
    )
    assert not bad


if __name__ == "__main__":
    config1()
    config2()
    config3()
