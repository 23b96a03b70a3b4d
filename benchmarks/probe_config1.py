#!/usr/bin/env python
"""Decompose BASELINE config 1 (AllocatedNum mul/add chain) into witness
generation vs check time, and sweep the chunk batch — finds where the
time goes on the deep sequential field chain."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bellpepper_tpu.compile.pipeline import (
        build_chunked_check,
        build_production_step,
    )
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
    from bellpepper_tpu.gadgets.multipack import pack_bits
    from bellpepper_tpu.r1cs import ShapeCS

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(128)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:64])
        b = pack_bits(cs.namespace("pb"), bs[64:])
        x = a
        for i in range(30):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"a{i}"), a)
            x = x.square(cs.namespace(f"s{i}"))

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    Rt = template.num_constraints
    print(f"template: {Rt} constraints, {prog.num_slots} slots")

    def timed(fn, args, reps=6):
        out = fn(*args)
        jax.block_until_ready(out)
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        outs = []
        for _ in range(reps):
            outs.append(fn(*args))
        jax.block_until_ready(outs[-1])
        return (time.time() - t0) / reps

    rng = np.random.default_rng(5)
    for B, n_chunks in [(8192, 2), (16384, 1), (32768, 1)]:
        total_c = n_chunks * B * Rt
        free = jnp.asarray(
            rng.integers(0, 2, size=(n_chunks, B, 128)).astype(np.uint32)
        )
        step = build_production_step(prog, template, B)
        t_step = timed(step, (free,))

        # witness-only: evaluator + limb-form z assembly, chunk-scanned
        evaluator = prog.build(True)
        n_ff = max(len(prog.free_field_slots), 1)

        @jax.jit
        def gen(free_bits):
            ff = jnp.zeros(free_bits.shape[:2] + (n_ff, 16), jnp.uint32)

            def body(carry, xs):
                fb, f = xs
                vals, flimbs = evaluator(fb, f)
                return carry, prog.z_template_limbs(vals, flimbs, f)

            _, out = jax.lax.scan(body, 0, (free_bits, ff))
            return out

        t_wit = timed(gen, (free,))
        z4 = gen(free)
        check = build_chunked_check(template, B, n_chunks, True, "limbs")
        t_chk = timed(check, (z4,))
        print(
            f"B={B:6d} x{n_chunks}: step {t_step*1e3:7.1f} ms "
            f"({total_c/t_step/1e6:7.1f}M c/s) | witness {t_wit*1e3:7.1f} ms "
            f"| check {t_chk*1e3:7.1f} ms"
        )


if __name__ == "__main__":
    main()
