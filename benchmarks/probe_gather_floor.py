#!/usr/bin/env python
"""Microbenchmark: attacks on the monolithic-check random-gather floor
(BASELINE config 5 bottleneck — 3 random z-gathers per row at 2^24 rows).

Strategies measured on the real chip, all computing z[idx] for
idx ~ U[0, N0) with z: uint32[N0, 16] (N0 = 2^20, the free-witness
window) and |idx| = 2^24:

  A. plain        — jnp.take(z, idx, axis=0), the current path.
  B. sorted       — gather in sorted-index order (does HBM locality help
                    the DMA engine at all?). Cost of the on-device sort
                    is NOT counted — this only asks if sortedness helps.
  C. block-fetch  — two-level: fetch a G-row block per index
                    (z[idx // G] with z reshaped [N0/G, G, 16]) then
                    select the lane locally. Trades descriptor count for
                    payload size; wins iff the gather is descriptor-rate
                    bound and G·64B stays under the per-descriptor
                    bandwidth knee.
  D. batched      — one gather serving B independent systems that share
                    the matrix (z3[B, N0, 16], take along axis 1).
                    Amortizes descriptors across the batch payload; this
                    is the "k independent 2^24 systems" production shape.
  E. chunked scan — the row-chunked shape actually used by
                    build_row_chunked_check (gather inside lax.scan over
                    128 chunks), to see how much the scan adds on top
                    of raw gather.

Prints one line per strategy: ns/index and effective GB/s.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, *args, reps=4):
    # Sync by FETCHING the scalar result (int(...)): over the axon tunnel
    # block_until_ready has been observed returning before execution
    # completes, which reports enqueue time (~40 µs) instead of run time.
    # The device executes queued steps in order, so fetching the last
    # rep's scalar covers them all.
    _ = int(fn(*args))
    _ = int(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    _ = int(outs[-1])
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    LOG2_N = 24
    N = 1 << LOG2_N
    N0 = 1 << 20
    rng = np.random.default_rng(11)
    idx_np = rng.integers(0, N0, size=N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    z = jnp.asarray(rng.integers(0, 1 << 16, size=(N0, 16)).astype(np.uint32))

    def report(name, dt, n_idx=N, payload=64):
        print(
            f"{name:14s} {dt*1e3:8.2f} ms  {dt/n_idx*1e9:7.2f} ns/idx  "
            f"{n_idx*payload/dt/1e9:7.1f} GB/s"
        )

    # A. plain
    @jax.jit
    def plain(z, idx):
        return jnp.sum(jnp.take(z, idx, axis=0), dtype=jnp.uint32)

    report("A plain", timed(plain, z, idx))

    # B. sorted order
    idx_sorted = jnp.asarray(np.sort(idx_np))
    report("B sorted", timed(plain, z, idx_sorted))

    # C. block-fetch, G in {8, 16} — chunk the index set so the [n, G, 16]
    # intermediate stays ~64 MB instead of N·G·64 B (16 GB at G=16).
    for G in (8, 16):
        zg = z.reshape(N0 // G, G, 16)
        n_chunks_c = 16 * G
        idx_cc = idx.reshape(n_chunks_c, N // n_chunks_c)

        @jax.jit
        def blockfetch(zg, idx_cc, G=G):
            def body(acc, ic):
                rows = jnp.take(zg, ic // G, axis=0)  # [n, G, 16]
                sel = jnp.take_along_axis(
                    rows, (ic % G)[:, None, None].astype(jnp.int32), axis=1
                )[:, 0]
                return acc + jnp.sum(sel, dtype=jnp.uint32), 0

            acc, _ = jax.lax.scan(body, jnp.uint32(0), idx_cc)
            return acc

        report(f"C block G={G}", timed(blockfetch, zg, idx_cc))

    # D. batched systems sharing the index set
    for B in (2, 4, 8):
        z3 = jnp.broadcast_to(z[None], (B, N0, 16)).copy()

        @jax.jit
        def batched(z3, idx):
            return jnp.sum(jnp.take(z3, idx, axis=1), dtype=jnp.uint32)

        dt = timed(batched, z3, idx)
        report(f"D batch B={B}", dt, n_idx=N, payload=64 * B)
        print(f"               -> per-system: {dt/N*1e9/B:7.2f} ns/idx")

    # E. chunked scan (the shape build_row_chunked_check uses), sweeping
    # the chunk count — per-chunk scan overhead vs intermediate size.
    for n_chunks in (4, 16, 64, 128):
        idx_c = idx.reshape(n_chunks, N // n_chunks)

        @jax.jit
        def chunked(z, idx_c):
            def body(acc, ic):
                return (
                    acc + jnp.sum(jnp.take(z, ic, axis=0), dtype=jnp.uint32),
                    0,
                )

            acc, _ = jax.lax.scan(body, jnp.uint32(0), idx_c)
            return acc

        report(f"E chunk n={n_chunks}", timed(chunked, z, idx_c))

    # F. three index planes per row (the real check's A/B/C gathers),
    # flat — the attainable floor for the full monolithic check's
    # gather phase.
    idx3 = jnp.asarray(rng.integers(0, N0, size=(3, N)).astype(np.int32))

    @jax.jit
    def three_plane(z, idx3):
        g = jnp.take(z, idx3.reshape(-1), axis=0)
        return jnp.sum(g, dtype=jnp.uint32)

    report("F 3-plane flat", timed(three_plane, z, idx3), n_idx=3 * N)


if __name__ == "__main__":
    main()
