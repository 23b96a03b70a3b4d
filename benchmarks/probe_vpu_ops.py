#!/usr/bin/env python
"""Measure per-op VPU throughput on this chip for the op classes the
field kernels are built from: u32 multiply, u32 add, u32 shift/mask,
f32 multiply-add, and u32<->f32 converts.

Each probe is a Pallas kernel holding one (8, 128)-tiled block in VMEM
and applying K dependent-ish rounds of the op across R independent rows
(R-way ILP so the measurement is throughput, not latency). HBM traffic
is one read + one write per row — negligible against K·R ops/element.

Why: the roofline in BASELINE.md assumes 3.8T int32 op/s (all ops equal).
If the VPU multiplies 32-bit integers by emulation (multiple passes), the
modmul kernels' "5-8% of speed-of-light" is actually much closer to the
real ceiling, and the next speedup must come from moving multiplies to
f32 (exact for 8-bit digit products) or the MXU — not from scheduling."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8  # independent rows (ILP)
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64  # rounds per row
    N = 1 << 20  # elements per row

    def make(op_name):
        def kernel(x_ref, o_ref):
            rows = [x_ref[r] for r in range(R)]
            for _ in range(K):
                for r in range(R):
                    v = rows[r]
                    if op_name == "u32_mul":
                        rows[r] = v * (v | jnp.uint32(1))
                    elif op_name == "u32_add":
                        rows[r] = v + (v | jnp.uint32(1))
                    elif op_name == "u32_shift_and":
                        rows[r] = (v >> 3) & jnp.uint32(0xFFFF)
                    elif op_name == "u16_mul":
                        # operands pre-masked to 16 bits: does the
                        # compiler use a cheaper multiply?
                        rows[r] = (v & jnp.uint32(0xFFFF)) * jnp.uint32(3)
                    elif op_name == "f32_mul":
                        rows[r] = v * v
                    elif op_name == "f32_fma":
                        rows[r] = v * v + v
                    elif op_name == "cvt_u32_f32":
                        rows[r] = (
                            v.astype(jnp.int32).astype(jnp.float32)
                            .astype(jnp.int32).astype(jnp.uint32)
                        )
                    else:
                        raise AssertionError(op_name)
            acc = rows[0]
            for r in range(1, R):
                acc = (
                    acc + rows[r]
                    if acc.dtype != jnp.float32
                    else acc + rows[r]
                )
            o_ref[...] = acc[None]

        dt = jnp.float32 if op_name.startswith("f32") else jnp.uint32
        x = jnp.asarray(
            np.random.default_rng(0).integers(1, 100, size=(R, N)),
            dt,
        )

        @jax.jit
        def run(x):
            grid = (N // 1024,)
            blk = lambda rows: pl.BlockSpec(
                (rows, 8, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[blk(R)],
                out_specs=blk(1),
                out_shape=jax.ShapeDtypeStruct((1, N // 128, 128), dt),
            )(x.reshape(R, N // 128, 128))

        return run, x

    print(f"rows={R} rounds={K} N={N} -> {R*K} ops/element")
    results = {}
    for op in (
        "u32_add",
        "u32_mul",
        "u16_mul",
        "u32_shift_and",
        "f32_mul",
        "f32_fma",
        "cvt_u32_f32",
    ):
        run, x = make(op)
        out = run(x)
        jax.block_until_ready(out)
        _ = float(np.asarray(out).reshape(-1)[0])  # axon sync warm-up
        t0 = time.time()
        outs = [run(x) for _ in range(8)]
        jax.block_until_ready(outs[-1])
        dt = (time.time() - t0) / 8
        ops = R * K * N / dt
        results[op] = ops
        print(f"{op:14s}: {dt*1e3:7.2f} ms  -> {ops/1e9:8.1f} G op/s")
    base = results.get("u32_add")
    if base:
        print("\nrelative cost (u32_add = 1):")
        for op, ops in results.items():
            print(f"  {op:14s}: {base/ops:5.2f}")


if __name__ == "__main__":
    main()
