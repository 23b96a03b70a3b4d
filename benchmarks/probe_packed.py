#!/usr/bin/env python
"""Probe: bit-sliced (packed) flagship path vs the unpacked baseline.

Measures, on the real chip:
  1. packed witness generation rate (vs the ~1.83G el/s unpacked);
  2. the packed production step (witness+check in one dispatch) across
     batch sizes, in constraint-evals/s.

Usage: python benchmarks/probe_packed.py [batches...]  (default 4096 8192 16384)
"""

import json
import os
import sys
import jax as _jax_cache

_jax_cache.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
_jax_cache.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]
    import jax
    import jax.numpy as jnp

    from bellpepper_tpu.compile.pipeline import (
        build_packed_chunked_witness,
        build_packed_production_step,
    )
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.native import NativeBuilder

    rng = np.random.default_rng(0x5962BE3D)
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    template, tape = nb.finish()
    prog = WitnessProgram(tape)
    assert prog.is_packable
    S = prog.num_slots

    for B in batches:
        Bw = B // 32
        # keep the instance count per step ~constant (~32k) across B
        n_chunks = max(1, 32768 // B)
        free = jnp.asarray(
            rng.integers(0, 1 << 32, size=(n_chunks, Bw, 512), dtype=np.uint64)
            .astype(np.uint32)
        )

        gen = build_packed_chunked_witness(prog)

        @jax.jit
        def gen_probe(f):
            return jnp.sum(gen(f), dtype=jnp.uint32)

        t0 = time.time()
        _ = int(gen_probe(free))
        t_compile_gen = time.time() - t0
        reps = 4
        t0 = time.time()
        accs = [gen_probe(free) for _ in range(reps)]
        _ = int(accs[-1])
        t_gen = (time.time() - t0) / reps
        el_s = n_chunks * B * S / t_gen

        step = build_packed_production_step(prog, template, B)
        t0 = time.time()
        total, _f = step(free)
        ok = int(total) == 0
        t_compile_step = time.time() - t0
        total, _f = step(free)
        ok = ok and int(total) == 0
        t0 = time.time()
        totals = [step(free)[0] for _ in range(reps)]
        jax.block_until_ready(totals[-1])
        t_step = (time.time() - t0) / reps
        ok = ok and sum(int(t) for t in totals) == 0
        total_constraints = n_chunks * B * template.num_constraints

        print(
            json.dumps(
                {
                    "batch": B,
                    "chunks": n_chunks,
                    "witness_el_per_s": round(el_s / 1e9, 3),
                    "witness_gen_s": round(t_gen, 5),
                    "step_s": round(t_step, 5),
                    "constraints_per_s": round(total_constraints / t_step / 1e9, 3),
                    "satisfied": ok,
                    "compile_s": [round(t_compile_gen, 1), round(t_compile_step, 1)],
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
