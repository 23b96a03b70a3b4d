#!/usr/bin/env python
"""bellpepper_tpu headline benchmark.

Flagship configuration (BASELINE.json): batches of SHA-256 compression
circuits. Measures the FULL production path in one dispatch — packed
free input bits → bit-sliced device witness generation (32 instances
per uint32 word, WitnessProgram.build_packed) → bits_packed templated
satisfiability with the reduced (n_bad, first) verdict — as a single
jitted program (compile/pipeline.build_packed_production_step). One
dispatch per step amortizes the ~35 ms tunnel fixed cost.

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

    from bellpepper_tpu.backend.matvec import build_templated_check
    from bellpepper_tpu.compile.pipeline import (
        build_packed_chunked_witness,
        build_packed_production_step,
    )
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.native import NativeBuilder

    rng = np.random.default_rng(0x5962BE3D)

    # Native (C++) synthesis of the template: one sha256 compression with
    # 512 free input bits. The first phase includes a one-time g++ build of
    # _synthesis.so in a fresh checkout (the .so is gitignored) — report
    # the split so that build cost isn't read as per-circuit synthesis.
    t0 = time.time()
    from bellpepper_tpu.native import load_library

    load_library()
    t_solib = time.time() - t0
    # TPU backend/tunnel handshake is environment setup, not synthesis:
    # force it here so t_wprog measures the compile, and report it.
    t0 = time.time()
    jax.devices()
    t_backend = time.time() - t0
    t0 = time.time()
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    template, tape = nb.finish()
    t_native = time.time() - t0
    t0 = time.time()
    prog = WitnessProgram(tape)
    t_wprog = time.time() - t0
    t_synth = t_native + t_wprog
    assert prog.is_pure_bits

    # One production step = 4 chunks x 32768 instances (3.45G
    # constraints), all inside a single jitted program: bit-sliced
    # packed witness generation + the packed check's reduced verdict.
    # (4 chunks measured 58.1G vs 54.5G c/s at 2 — deeper scan
    # pipelining amortizes the per-dispatch fixed cost further.)
    B = 32768
    Bw = B // 32
    n_chunks = 4
    total_constraints = n_chunks * B * template.num_constraints
    free = jnp.asarray(
        rng.integers(0, 1 << 32, size=(n_chunks, Bw, 512), dtype=np.uint64)
        .astype(np.uint32)
    )

    step = build_packed_production_step(prog, template, B)
    total, _first = step(free)  # compile + first run
    ok_first = int(total) == 0
    total, _first = step(free)  # second warm run (post-compile settling)
    ok_first = ok_first and int(total) == 0

    # Collect per-rep verdict scalars and block only on the LAST one: the
    # device executes the queued steps in order, so syncing the last rep
    # covers them all. Folding `acc + total` on device instead would put
    # one eager scalar-add dispatch (~45 ms over the tunnel) on the
    # critical path per rep and halve the measured throughput.
    reps = 6
    t0 = time.time()
    totals = []
    for _ in range(reps):
        total, _f = step(free)
        totals.append(total)
    jax.block_until_ready(totals[-1])
    t_step = (time.time() - t0) / reps
    any_bad = sum(int(t) for t in totals) != 0
    throughput = total_constraints / t_step

    # --- packed witness generation rate (all chunks in ONE dispatch) ---
    gen = build_packed_chunked_witness(prog)

    @jax.jit
    def gen_probe(f):
        return jnp.sum(gen(f), dtype=jnp.uint32)

    acc = gen_probe(free)
    _ = int(acc)  # compile + sync
    wreps = 4
    t0 = time.time()
    accs = [gen_probe(free) for _i in range(wreps)]
    _ = int(accs[-1])
    t_wit = (time.time() - t0) / wreps
    witness_elems_per_s = (n_chunks * B * prog.num_slots) / t_wit
    b_2e20 = max(1, (1 << 20) // template.num_constraints)
    t_wit_2e20 = t_wit / (n_chunks * B) * b_2e20

    # --- corruption probe: flip one witness bit → must detect ---
    vp = gen(free)[0]  # [Bw, S] packed witness of chunk 0
    viol = build_templated_check(template, B, True, "bits_packed")
    verdict = jax.jit(viol.verdict)
    nb0, _f0 = verdict(vp)
    check_ok = int(nb0) == 0
    vbad = vp.at[Bw // 2, 600].set(vp[Bw // 2, 600] ^ jnp.uint32(1 << 7))
    nbb, _fb = verdict(vbad)
    detected = int(nbb) > 0

    result = {
        "metric": "sha256 witness+check constraint-evaluations/s/chip",
        "value": round(throughput, 1),
        "unit": "constraints/s",
        "vs_baseline": round(throughput / 125e6, 4),
        "detail": {
            "device": str(jax.devices()[0]),
            "constraints_per_step": total_constraints,
            "chunks": n_chunks,
            "chunk_batch": B,
            "witness_layout": "bit-sliced packed (32 instances/u32 word)",
            "template_constraints": template.num_constraints,
            "satisfied": ok_first and not any_bad and check_ok,
            "corruption_detected": bool(detected),
            "step_s": round(t_step, 4),
            "witness_gen_2e20_us": round(t_wit_2e20 * 1e6, 1),
            "witness_elements_per_s": round(witness_elems_per_s, 1),
            "host_synthesis_s": round(t_synth, 2),
            "host_split_s": {
                "native_solib_build": round(t_solib, 2),
                "backend_init": round(t_backend, 2),
                "native_synthesis": round(t_native, 3),
                "witness_program_compile": round(t_wprog, 2),
            },
        },
    }
    assert result["detail"]["satisfied"], "benchmark circuit unsatisfied!"
    assert detected, "corruption not detected!"
    print(json.dumps(result))


def _main_with_retry():
    """The axon tunnel occasionally drops a dispatch with UNAVAILABLE /
    INTERNAL ('TPU worker process crashed or restarted'). Once the worker
    has crashed, the in-process PJRT client is dead — every subsequent
    call fails — so the retry must be a FRESH PROCESS: re-exec this
    script (up to 2 retries, with a pause for the worker to restart).
    The persistent compile cache makes the retried run start fast."""
    import os

    attempt = int(os.environ.get("BP_BENCH_ATTEMPT", "0"))
    try:
        return main()
    except Exception as e:  # noqa: BLE001 — retry only infra flakes
        name = type(e).__name__
        msg = str(e)
        # Only retry genuine infra flakes: UNAVAILABLE, or INTERNAL paired
        # with a worker-crash phrase. A bare INTERNAL can be a deterministic
        # XLA compiler error — re-exec'ing those just wastes 2x20s.
        transient = "JaxRuntimeError" in name and (
            "UNAVAILABLE" in msg
            or (
                "INTERNAL" in msg
                and ("crashed" in msg or "restarted" in msg or "socket" in msg)
            )
        )
        if not transient or attempt >= 2:
            raise
        print(
            f"# transient TPU error (attempt {attempt}), re-exec'ing fresh "
            f"process: {msg[:120]}",
            file=sys.stderr,
        )
        sys.stderr.flush()
        time.sleep(20)
        os.environ["BP_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(
            sys.executable,
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
        )


if __name__ == "__main__":
    sys.exit(_main_with_retry())
