#!/usr/bin/env python
"""BASELINE configs 1-3, measured on the one-dispatch production pipeline
(witness generation + satisfiability inside a single jitted lax.scan over
instance chunks — compile/pipeline.py):

  1. AllocatedNum mul/add circuit — fused-limbs Pallas path.
  2. Boolean/UInt32 bitwise circuit (xor, rotr, addmany) — fused-bits path.
  3. multipack + multieq batched equality circuit at ~2^16 constraints
     per chunk.

Prints one JSON line per config."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax as _jax_cache

_jax_cache.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
_jax_cache.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

import numpy as np


def _measure_step(step, free, reps=6):
    import jax

    total, _ = step(free)  # compile + first
    ok = int(total) == 0
    total, _ = step(free)  # second warm run (post-compile settling)
    ok = ok and int(total) == 0
    # Collect verdicts and sync on the LAST only (the device runs queued
    # steps in order); an on-device `acc + total` fold would add one eager
    # scalar dispatch (~45 ms tunnel round trip) per rep to the loop.
    t0 = time.time()
    totals = []
    for _ in range(reps):
        total, _f = step(free)
        totals.append(total)
    jax.block_until_ready(totals[-1])
    dt = (time.time() - t0) / reps
    bad = sum(int(t) for t in totals)
    return dt, ok and bad == 0


def _emit(name, template, B, n_chunks, dt, ok, t_synth, extra=None):
    total = n_chunks * B * template.num_constraints
    detail = {
        "constraints_per_step": total,
        "chunk_batch": B,
        "chunks": n_chunks,
        "satisfied": ok,
        "step_s": round(dt, 4),
        "synthesis_s": round(t_synth, 3),
    }
    if extra:
        detail.update(extra)
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(total / dt, 1),
                "unit": "constraints/s",
                "detail": detail,
            }
        )
    )
    assert ok


def config1():
    import jax
    import jax.numpy as jnp

    from bellpepper_tpu.compile.pipeline import build_production_step
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
    from bellpepper_tpu.gadgets.multipack import pack_bits
    from bellpepper_tpu.r1cs import ShapeCS

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

    # Deep sequential field chains are latency-bound on the per-stage scan
    # steps: fewer/bigger chunks amortize them (58M vs 34M c/s at 2048×8).
    import os

    # 8192x4 measured best on v5e (133.5M c/s vs 117-126M at 8192x2:
    # the 54 ms step rides above tunnel jitter; 16384-inst chunks are
    # slower despite better witness rates — check-side temps grow).
    B = int(os.environ.get("BP_CFG1_B", "8192"))
    n_chunks = int(os.environ.get("BP_CFG1_CHUNKS", "4"))
    step = build_production_step(prog, template, B)
    free = jnp.asarray(
        np.random.default_rng(5)
        .integers(0, 2, size=(n_chunks, B, 128))
        .astype(np.uint32)
    )
    dt, ok = _measure_step(step, free)

    # field-path witness generation rate: the chunk-scanned generator
    # (one dispatch for all chunks — the shape the production step uses;
    # eager per-call prog.run pays ~35 ms of tunnel dispatch per chunk
    # and measured 20x slower than the pipeline's witness stage)
    from bellpepper_tpu.compile.pipeline import build_chunked_witness

    gen = build_chunked_witness(prog)
    v0 = gen(free)
    _ = int(jnp.sum(v0[0, 0, :1]))
    wreps = 8
    t0 = time.time()
    outs = [gen(free) for _ in range(wreps)]
    _ = int(jnp.sum(outs[-1][0, 0, :1]))
    t_wit = (time.time() - t0) / wreps
    _unused, f0 = prog.run(free[0, :128])
    n_field_elems = B * (len(prog.free_field_slots) + f0.shape[1])
    extra = {
        "field_witness_elements_per_s": round(
            n_chunks * B * prog.num_slots / t_wit, 1
        ),
        "witness_gen_s": round(t_wit, 4),
        "field_values_per_chunk": int(n_field_elems),
    }
    _emit(
        "config1 AllocatedNum mul/add constraint-evals/s",
        template, B, n_chunks, dt, ok, t_synth, extra,
    )


def config2():
    import jax.numpy as jnp

    from bellpepper_tpu.compile.pipeline import build_packed_production_step
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.multieq import MultiEq
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
    assert prog.is_packable

    # Bit-sliced packed production step: 32 instances per uint32 word.
    B, n_chunks = 32768, 4
    step = build_packed_production_step(prog, template, B)
    free = jnp.asarray(
        np.random.default_rng(6)
        .integers(
            0, 1 << 32, size=(n_chunks, B // 32, len(prog.free_slots)),
            dtype=np.uint64,
        )
        .astype(np.uint32)
    )
    dt, ok = _measure_step(step, free)
    _emit(
        "config2 UInt32 bitwise constraint-evals/s",
        template, B, n_chunks, dt, ok, t_synth,
        {"witness_layout": "bit-sliced packed (32 instances/u32 word)"},
    )


def config3():
    import jax.numpy as jnp

    from bellpepper_tpu.compile.pipeline import build_packed_production_step
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.multieq import MultiEq
    from bellpepper_tpu.gadgets.multipack import pack_bits as gpack
    from bellpepper_tpu.gadgets.uint32 import UInt32
    from bellpepper_tpu.r1cs import ShapeCS

    # multieq-batched equalities + multipack of the results into field
    # elements (multipack.rs:76-105) — the field-bearing bit template.
    def circuit(cs):
        words = [UInt32.alloc(cs.namespace(f"w{i}"), None) for i in range(4)]
        with MultiEq(cs) as mcs:
            acc = words[0]
            for i in range(1, 4):
                acc = UInt32.addmany(mcs.namespace(f"add {i}"), [acc, words[i]])
        gpack(cs.namespace("pack"), acc.into_bits())

    t0 = time.time()
    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    t_synth = time.time() - t0
    assert not prog.is_packable and prog.is_packable_mixed

    # MIXED packed path: bit slots 32 instances/uint32 word, the pack
    # output in an unpacked limb sidecar checked as bit-sliced integer
    # equality — 99% bit rows no longer forfeit the packed speedup for
    # the 1% field rows.
    B, n_chunks = 32768, 4
    step = build_packed_production_step(prog, template, B)
    free = jnp.asarray(
        np.random.default_rng(7)
        .integers(
            0, 1 << 32, size=(n_chunks, B // 32, len(prog.free_slots)),
            dtype=np.uint64,
        )
        .astype(np.uint32)
    )
    dt, ok = _measure_step(step, free)
    _emit(
        "config3 multipack/multieq constraint-evals/s",
        template, B, n_chunks, dt, ok, t_synth,
        {"witness_layout": "mixed packed (bit words + field limb sidecar)"},
    )


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "123"
    if "1" in which:
        config1()
    if "2" in which:
        config2()
    if "3" in which:
        config3()
