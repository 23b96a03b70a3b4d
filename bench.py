#!/usr/bin/env python
"""bellpepper_tpu headline benchmark.

Flagship configuration (BASELINE.json): a batch of SHA-256 compression
circuits totalling ~2^20 constraints. Measures the full production path:

  1. witness generation on device (compiled witness program — the
     TPU-native SizedWitness), and
  2. R1CS satisfiability evaluation on device (ELL-bucketed sparse
     pipeline over Pallas field kernels),

and reports constraint-evaluations/s (amortized over repeated checks, one
scalar sync at the end — the tunnel's ~30 ms per-sync latency is reported
separately).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 125e6 — the per-chip share of the 1B/s v5p-16
target from BASELINE.json (8 chips)."""

import json
import sys
import time

import numpy as np


def main():
    import jax

    # Persist compiled executables across processes — remote TPU compiles
    # take minutes; the cache makes repeat runs start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import TemplatedSatisfier
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.native import NativeBuilder

    rng = np.random.default_rng(0x5962BE3D)

    # Native (C++) synthesis of the template: one sha256 compression with
    # 512 free input bits.
    t0 = time.time()
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    template, tape = nb.finish()
    prog = WitnessProgram(tape)
    t_synth = time.time() - t0
    assert prog.is_pure_bits

    # Work in chunks of 128 instances (amortizes the per-dispatch cost;
    # full-batch intermediates would exceed v5e HBM). The 2^20-constraint
    # figure of BASELINE.json corresponds to ~39 blocks; throughput is
    # measured over 8 chunks (27M constraints) for stable numbers.
    B = 128
    n_chunks = 8
    total_constraints = n_chunks * B * template.num_constraints

    sat = TemplatedSatisfier(template, B, witness_form="bits")

    free = jnp.asarray(
        rng.integers(0, 2, size=(n_chunks * B, 512)).astype(np.uint32)
    )

    # --- witness generation (device) ---
    v0, _f = prog.run(free[:B])  # compile
    _ = int(jnp.sum(v0[0, :4]))
    t0 = time.time()
    chunks = []
    for i in range(n_chunks):
        v, _f = prog.run(free[i * B : (i + 1) * B])
        chunks.append(v)
    _ = int(jnp.sum(chunks[-1][0, :4]))
    t_wit = time.time() - t0
    witness_elems_per_s = (n_chunks * B * prog.num_slots) / t_wit
    # Witness time for a 2^20-constraint circuit, derived from the
    # measured per-block rate (a dedicated 39-block run would recompile
    # for the new shape and time the compiler instead).
    b_2e20 = max(1, (1 << 20) // template.num_constraints)
    t_wit_2e20 = t_wit / (n_chunks * B) * b_2e20

    # --- satisfiability (device) ---
    ok_first = sat.is_satisfied(chunks[0])
    ab, _ = sat._check(chunks[0])
    _ = bool(ab)
    t0 = time.time()
    acc = None
    for v in chunks:
        ab, _first = sat._check(v)
        acc = ab if acc is None else (acc | ab)
    any_bad = bool(acc)
    t_check = time.time() - t0
    throughput = total_constraints / t_check

    # corruption probe: flip one witness bit → must detect
    v_bad = chunks[0].at[B // 2, 600].set(chunks[0][B // 2, 600] ^ 1)
    detected = not sat.is_satisfied(v_bad)

    result = {
        "metric": "sha256 constraint-evaluations/s/chip",
        "value": round(throughput, 1),
        "unit": "constraints/s",
        "vs_baseline": round(throughput / 125e6, 4),
        "detail": {
            "device": str(jax.devices()[0]),
            "constraints": total_constraints,
            "chunk": B,
            "template_constraints": template.num_constraints,
            "satisfied": bool(ok_first) and not any_bad,
            "corruption_detected": bool(detected),
            "witness_gen_2e20_s": round(t_wit_2e20, 4),
            "witness_elements_per_s": round(witness_elems_per_s, 1),
            "check_s": round(t_check, 4),
            "host_synthesis_s": round(t_synth, 2),
        },
    }
    assert result["detail"]["satisfied"], "benchmark circuit unsatisfied!"
    assert detected, "corruption not detected!"
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
