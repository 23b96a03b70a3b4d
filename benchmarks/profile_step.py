#!/usr/bin/env python
"""Decompose the headline production step into its components and time
each on the real chip (enqueue many reps, sync once — the ~32 ms tunnel
round trip would otherwise swamp sub-50ms programs).

Components:
  witness   — chunked witness generation only (one dispatch)
  check     — chunked satisfiability only, witnesses precomputed
  step      — the full fused witness+check production step
  matvec1   — ONE fused bits matvec (A) at chunk size
  mullm     — the az∘bz modmul compare at [16, Rtp·B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, args, reps, sync):
    fn(*args)  # warm
    sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import build_templated_check
    from bellpepper_tpu.compile.pipeline import (
        build_chunked_check,
        build_chunked_witness,
        build_production_step,
    )
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.native import NativeBuilder

    rng = np.random.default_rng(1)
    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    template, tape = nb.finish()
    prog = WitnessProgram(tape)

    B, n_chunks = 128, 8
    total_c = n_chunks * B * template.num_constraints
    free = jnp.asarray(rng.integers(0, 2, size=(n_chunks, B, 512)).astype(np.uint32))

    sync = lambda out: jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )

    step = build_production_step(prog, template, B)
    t_step = timed(step, (free,), 4, sync)
    print(f"step      : {t_step*1e3:8.1f} ms  ({total_c/t_step/1e6:7.1f}M c/s)")

    gen = build_chunked_witness(prog)
    t_wit = timed(gen, (free,), 4, sync)
    S = prog.num_slots
    print(
        f"witness   : {t_wit*1e3:8.1f} ms  ({n_chunks*B*S/t_wit/1e6:7.1f}M elems/s)"
    )

    z4 = gen(free)
    check = build_chunked_check(template, B, n_chunks, True, "bits")
    t_chk = timed(check, (z4,), 4, sync)
    print(f"check     : {t_chk*1e3:8.1f} ms  ({total_c/t_chk/1e6:7.1f}M c/s)")

    # single fused matvec A at chunk granularity
    viol = build_templated_check(template, B, True, "bits")
    z3 = z4[0]
    vj = jax.jit(lambda z: jnp.sum(viol(z).astype(jnp.uint32)))
    t_v1 = timed(vj, (z3,), 8, sync)
    print(f"viol 1chnk: {t_v1*1e3:8.1f} ms  ({B*template.num_constraints/t_v1/1e6:7.1f}M c/s)")

    # the mul_lm compare alone at the check's size
    from bellpepper_tpu.backend.matvec import _PallasAdapter

    impl = _PallasAdapter(template.field)
    Rtp = template.num_constraints  # close enough (padded ~equal)
    x = jnp.asarray(
        rng.integers(0, 1 << 16, size=(16, Rtp * B), dtype=np.uint32)
    )
    mj = jax.jit(lambda a, b: impl.mul_lm(a, b))
    t_m = timed(mj, (x, x), 8, sync)
    print(f"mul_lm    : {t_m*1e3:8.1f} ms  ({Rtp*B/t_m/1e6:7.1f}M muls/s)  [x3 per check-chunk; x24 per step]")


if __name__ == "__main__":
    main()
