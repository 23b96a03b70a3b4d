#!/usr/bin/env python
"""BASELINE config 4: sha256 at Merkle scale — 1024 compression blocks
(≈27M constraints), the Merkle-leaf workload (independent blocks, as in
one tree level).

Template = one compression (native C++ synthesis); batch = 1024 instances.
Witness generation runs in one vectorized device program; satisfiability
is checked in instance chunks (the [32, slots, B] digit intermediates for
the full batch would exceed HBM).

Usage: python benchmarks/config4_merkle_1024.py [n_blocks] [chunk]"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import TemplatedSatisfier
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.native import NativeBuilder

    rng = np.random.default_rng(11)

    t0 = time.time()
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    template, tape = nb.finish()
    prog = WitnessProgram(tape)
    t_synth = time.time() - t0

    total_constraints = n_blocks * template.num_constraints
    assert n_blocks % chunk == 0
    sat = TemplatedSatisfier(template, chunk, witness_form="bits")

    free = jnp.asarray(rng.integers(0, 2, size=(n_blocks, 512)).astype(np.uint32))
    n_chunks = n_blocks // chunk

    # --- witness generation, chunked (full-batch buffers fault the v5e) ---
    v0, _f = prog.run(free[:chunk])  # warm
    _ = int(jnp.sum(v0[0, :4]))
    t0 = time.time()
    chunks = []
    for i in range(n_chunks):
        v, _f = prog.run(free[i * chunk : (i + 1) * chunk])
        chunks.append(v)
    _ = int(jnp.sum(chunks[-1][0, :4]))
    t_wit = time.time() - t0

    # --- chunked satisfiability over all blocks ---
    ab, _ = sat._check(chunks[0])  # warm
    _ = bool(ab)
    t0 = time.time()
    acc = None
    for v in chunks:
        ab, _f2 = sat._check(v)
        acc = ab if acc is None else (acc | ab)
    any_bad = bool(acc)
    t_check = time.time() - t0

    # corruption probe
    v_bad = chunks[0].at[3, 777].set(chunks[0][3, 777] ^ 1)
    ab, _f3 = sat._check(v_bad)
    detected = bool(ab)

    throughput = total_constraints / t_check
    print(
        json.dumps(
            {
                "metric": "sha256 Merkle-scale constraint-evals/s (1024 blocks)",
                "value": round(throughput, 1),
                "unit": "constraints/s",
                "vs_baseline": round(throughput / 125e6, 4),
                "detail": {
                    "device": str(jax.devices()[0]),
                    "blocks": n_blocks,
                    "constraints": total_constraints,
                    "chunk": chunk,
                    "satisfied": not any_bad,
                    "corruption_detected": detected,
                    "witness_gen_s": round(t_wit, 4),
                    "witness_elements_per_s": round(
                        n_blocks * prog.num_slots / t_wit, 1
                    ),
                    "check_s": round(t_check, 4),
                    "host_synthesis_s": round(t_synth, 2),
                },
            }
        )
    )
    assert not any_bad and detected


if __name__ == "__main__":
    main()
