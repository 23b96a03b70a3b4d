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

    # Batch to ~2^20 constraints.
    B = max(1, (1 << 20) // template.num_constraints)
    total_constraints = B * template.num_constraints

    sat = TemplatedSatisfier(template, B, witness_form="bits")

    free = rng.integers(0, 2, size=(B, 512)).astype(np.uint32)
    free_d = jnp.asarray(free)

    # --- witness generation (device) ---
    vals, _f = prog.run(free_d)  # compile + run
    _ = int(jnp.sum(vals[0, :4]))  # sync

    n_wit = 10
    t0 = time.time()
    acc = None
    for _ in range(n_wit):
        vals, _f = prog.run(free_d)
        acc = vals if acc is None else acc
    _ = int(jnp.sum(acc[0, :4]))
    t_wit = (time.time() - t0) / n_wit
    witness_elems_per_s = (B * prog.num_slots) / t_wit

    # --- satisfiability (device) ---
    ok_first = sat.is_satisfied(vals)
    n = 20
    t0 = time.time()
    acc = None
    for _ in range(n):
        ab, _first = sat._check(vals)
        acc = ab if acc is None else (acc | ab)
    any_bad = bool(acc)
    t_check = (time.time() - t0) / n
    throughput = total_constraints / t_check

    # corruption probe: flip one witness bit → must detect
    v_bad = vals.at[B // 2, 600].set(vals[B // 2, 600] ^ 1)
    detected = not sat.is_satisfied(v_bad)

    result = {
        "metric": "sha256 constraint-evaluations/s/chip (2^20-constraint batch)",
        "value": round(throughput, 1),
        "unit": "constraints/s",
        "vs_baseline": round(throughput / 125e6, 4),
        "detail": {
            "device": str(jax.devices()[0]),
            "constraints": total_constraints,
            "batch": B,
            "template_constraints": template.num_constraints,
            "satisfied": bool(ok_first) and not any_bad,
            "corruption_detected": bool(detected),
            "witness_gen_s": round(t_wit, 4),
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
