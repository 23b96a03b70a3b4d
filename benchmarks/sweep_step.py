#!/usr/bin/env python
"""Sweep (chunk batch, n_chunks) for the sha256 production step."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bellpepper_tpu.compile.pipeline import build_production_step
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.native import NativeBuilder

    rng = np.random.default_rng(7)
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    template, tape = nb.finish()
    prog = WitnessProgram(tape)
    Rt = template.num_constraints

    configs = [(128, 8), (256, 4), (512, 2), (1024, 1)]
    for B, n_chunks in configs:
        total_c = n_chunks * B * Rt
        free = jnp.asarray(
            rng.integers(0, 2, size=(n_chunks, B, 512)).astype(np.uint32)
        )
        try:
            step = build_production_step(prog, template, B)
            total, _ = step(free)
            assert int(total) == 0  # also forces completion
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                total, _ = step(free)
            assert int(total) == 0
            dt = (time.time() - t0) / reps
            print(
                f"B={B:5d} chunks={n_chunks}: {dt*1e3:7.1f} ms "
                f"-> {total_c/dt/1e6:7.1f}M c/s"
            )
        except Exception as e:
            print(f"B={B:5d} chunks={n_chunks}: FAILED {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
