#!/usr/bin/env python
"""BASELINE config 4: sha256 at Merkle scale — 1024 compression blocks
(≈27M constraints), the Merkle-leaf workload (independent blocks, as in
one tree level).

Template = one compression (native C++ synthesis); batch = 1024 instances.
Witness generation AND satisfiability run as ONE jitted production step
(lax.scan over 512-instance chunks — compile/pipeline.py; chunking keeps
peak HBM bounded, one dispatch amortizes the tunnel's fixed cost, and
bigger chunks cut the per-op launch count of the witness stages).

Usage: python benchmarks/config4_merkle_1024.py [n_blocks] [chunk]"""

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


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp

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
    n_chunks = n_blocks // chunk

    from bellpepper_tpu.compile.pipeline import build_packed_production_step

    # Bit-sliced packed step: all n_blocks instances in one chunk,
    # 32 instances per uint32 word.
    assert n_blocks % 512 == 0 and prog.is_packable
    free = jnp.asarray(
        rng.integers(
            0, 1 << 32, size=(1, n_blocks // 32, 512), dtype=np.uint64
        ).astype(np.uint32)
    )
    step = build_packed_production_step(prog, template, n_blocks)
    total, _f = step(free)  # compile + first
    ok_first = int(total) == 0
    total, _f = step(free)  # second warm run (post-compile settling)
    ok_first = ok_first and int(total) == 0
    # Sync on the last rep only — an on-device verdict fold would put one
    # eager scalar dispatch (~45 ms tunnel round trip) per rep on the
    # critical path.
    reps = 4
    t0 = time.time()
    totals = []
    for _ in range(reps):
        total, _f = step(free)
        totals.append(total)
    jax.block_until_ready(totals[-1])
    t_step = (time.time() - t0) / reps
    any_bad = sum(int(t) for t in totals) != 0

    # witness-generation-only rate (one chunk, packed)
    from bellpepper_tpu.backend.matvec import build_templated_check
    from bellpepper_tpu.compile.pipeline import build_packed_chunked_witness

    gen = build_packed_chunked_witness(prog)
    v0 = gen(free)[0]  # [n_blocks/32, S] packed
    _ = int(jnp.sum(v0[0, :4]))
    t0 = time.time()
    v0 = gen(free)[0]
    _ = int(jnp.sum(v0[0, :4]))
    t_wit = time.time() - t0

    # corruption probe (packed verdict)
    viol = build_templated_check(template, n_blocks, True, "bits_packed")
    verdict = jax.jit(viol.verdict)
    nb0, _f0 = verdict(v0)
    v_bad = v0.at[3, 777].set(v0[3, 777] ^ jnp.uint32(1 << 11))
    nbb, _fb = verdict(v_bad)
    detected = int(nb0) == 0 and int(nbb) > 0

    # --- true hash CHAIN: digest of block t is the IV of block t+1 ---
    # (device-side state threading via build_chained_production_step; the
    # witness scan is inherently sequential, the check is batched+fused)
    from bellpepper_tpu.compile.pipeline import build_chained_production_step
    from bellpepper_tpu.compile.tape import V_CONST

    t0 = time.time()
    nb2 = NativeBuilder()
    state = [nb2.alloc_bit() for _ in range(256)]
    msg = [nb2.alloc_bit() for _ in range(512)]
    out = nb2.sha256_compression(msg, state)
    chain_template, chain_tape = nb2.finish()
    carry_views = [nb2.view(v) for v in out]
    chain_prog = WitnessProgram(chain_tape)
    t_synth2 = time.time() - t0

    nb3 = NativeBuilder()
    iv_views = [nb3.view(v) for v in nb3.sha256_iv()]
    iv = np.asarray(
        [[v for (_k, v, _n) in iv_views]], np.uint32
    )  # [1, 256]
    msgs = rng.integers(0, 2, size=(n_blocks, 1, 512)).astype(np.uint32)

    chain_step = build_chained_production_step(
        chain_prog, chain_template, carry_views, check_batch=chunk
    )
    total_c, _f, final = chain_step(jnp.asarray(iv), jnp.asarray(msgs))
    chain_ok = int(total_c) == 0
    total_c, _f, final = chain_step(jnp.asarray(iv), jnp.asarray(msgs))
    chain_ok = chain_ok and int(total_c) == 0
    reps_c = 2
    t0 = time.time()
    totals_c = []
    for _ in range(reps_c):
        total_c, _f, final = chain_step(jnp.asarray(iv), jnp.asarray(msgs))
        totals_c.append(total_c)
    jax.block_until_ready(totals_c[-1])
    t_chain = (time.time() - t0) / reps_c
    chain_bad = sum(int(t) for t in totals_c) != 0
    chain_constraints = n_blocks * chain_template.num_constraints

    # --- config4b_multi: B INDEPENDENT chains through one scan. The
    # 1024-block single chain is latency-bound (1024 dependent evaluator
    # steps with the device mostly idle); B chains amortize each step's
    # fixed cost ~linearly until the batched check saturates — the
    # "inherently sequential" number is per-chain latency, not a
    # framework ceiling. [B, ...] shapes ride build_chained_witness's
    # existing batch axis.
    multi_rows = []
    for Bc in (1, 8, 64):
        iv_b = np.broadcast_to(iv, (Bc, 256)).copy()
        msgs_b = rng.integers(0, 2, size=(n_blocks, Bc, 512)).astype(
            np.uint32
        )
        try:
            step_b = build_chained_production_step(
                chain_prog, chain_template, carry_views, check_batch=chunk
            )
            tc, _f, _fin = step_b(jnp.asarray(iv_b), jnp.asarray(msgs_b))
            ok_b = int(tc) == 0
            t0 = time.time()
            tc, _f, _fin = step_b(jnp.asarray(iv_b), jnp.asarray(msgs_b))
            jax.block_until_ready(tc)
            dt_b = time.time() - t0
            ok_b = ok_b and int(tc) == 0
        except Exception as e:  # noqa: BLE001 — record OOM honestly
            multi_rows.append({"chains": Bc, "error": str(e)[:120]})
            continue
        cb = n_blocks * Bc * chain_template.num_constraints
        multi_rows.append(
            {
                "chains": Bc,
                "constraints": cb,
                "step_s": round(dt_b, 4),
                "constraints_per_s": round(cb / dt_b, 1),
                "satisfied": ok_b,
            }
        )
    best = max(
        (r for r in multi_rows if "constraints_per_s" in r),
        key=lambda r: r["constraints_per_s"],
    )
    print(
        json.dumps(
            {
                "metric": "config4b_multi sequential chains x batch "
                "constraint-evals/s (1024 blocks/chain)",
                "value": best["constraints_per_s"],
                "unit": "constraints/s",
                "detail": {"table": multi_rows, "blocks_per_chain": n_blocks},
            }
        )
    )

    throughput = total_constraints / t_step
    print(
        json.dumps(
            {
                "metric": "sha256 sequential hash chain constraint-evals/s "
                "(1024 chained blocks, one dispatch)",
                "value": round(chain_constraints / t_chain, 1),
                "unit": "constraints/s",
                "detail": {
                    "blocks": n_blocks,
                    "constraints": chain_constraints,
                    "template_constraints": chain_template.num_constraints,
                    "satisfied": chain_ok and not chain_bad,
                    "step_s": round(t_chain, 4),
                    "host_synthesis_s": round(t_synth2, 2),
                },
            }
        )
    )
    assert chain_ok and not chain_bad
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
                    "chunk": n_blocks,
                    "witness_layout": "bit-sliced packed (32 instances/u32 word)",
                    "satisfied": ok_first and not any_bad,
                    "corruption_detected": detected,
                    "witness_elements_per_s": round(
                        n_blocks * prog.num_slots / t_wit, 1
                    ),
                    "step_s": round(t_step, 4),
                    "host_synthesis_s": round(t_synth, 2),
                },
            }
        )
    )
    assert ok_first and not any_bad and detected


if __name__ == "__main__":
    main()
