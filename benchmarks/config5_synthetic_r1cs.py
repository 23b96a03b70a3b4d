#!/usr/bin/env python
"""BASELINE config 5: row-sharded synthetic R1CS with device witness
completion and a psum-reduced satisfiability verdict.

The synthetic system has R rows of the form (c1·z[i1] + c2·z[i2]) · z[i3]
= z[N0 + r], where the product witness segment is COMPLETED ON DEVICE by
evaluating A·z and B·z with the framework's own matvec — i.e. witness
generation and checking both run on the accelerator; the host only builds
indices.

Usage: python benchmarks/config5_synthetic_r1cs.py [log2_constraints]
           [n_devices] [log2_rows_per_chunk]
Defaults: 2^20 rows on all local devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 + cpu platform for a
virtual mesh); 2^19 rows per CHECK chunk and 2^17 per witness-completion
chunk — both measured optima on v5e at 2^24 rows (13.3M c/s check /
2.7s completion; the probe_gather_floor.py knee predicting gains at
>= 2^21 indices does NOT transfer to this access pattern: rpc 2^20 and
2^21 measured 1.6-1.8x SLOWER, see BASELINE.md)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import jax as _jax_cache

_jax_cache.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
_jax_cache.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

import numpy as np


def main():
    log2_r = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax
    import jax.numpy as jnp

    from bellpepper_tpu.backend.field_jnp import get_backend
    from bellpepper_tpu.backend.sharding import RowShardedSatisfier, default_mesh
    from bellpepper_tpu.fields import SCALAR
    from bellpepper_tpu.r1cs import COOMatrix, R1CS

    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    R = 1 << log2_r
    N0 = min(R, 1 << 20)  # free witness segment
    rng = np.random.default_rng(7)

    # --- host: build indices only ---
    t0 = time.time()
    coeff_table = [1, 2, (1 << 17) % SCALAR.p, SCALAR.p - 1, 0]
    rows = np.arange(R, dtype=np.int32)
    # dtype-direct generation: .astype() round trips double the memory
    # passes at 2^25 entries (measured ~1.5 s of the host build)
    a = COOMatrix(
        rows=np.repeat(rows, 2),
        cols=rng.integers(1, N0, size=2 * R, dtype=np.int32),
        coeff_ids=rng.integers(0, 4, size=2 * R, dtype=np.int32),
    )
    b = COOMatrix(
        rows=rows.copy(),
        cols=rng.integers(1, N0, size=R, dtype=np.int32),
        coeff_ids=np.zeros(R, np.int32),
    )
    c = COOMatrix(
        rows=rows.copy(),
        cols=N0 + 1 + np.arange(R, dtype=np.int32),
        coeff_ids=np.zeros(R, np.int32),
    )
    r1cs = R1CS(
        field=SCALAR,
        num_inputs=1,
        num_aux=N0 + R,
        num_constraints=R,
        a=a,
        b=b,
        c=c,
        coeff_table=coeff_table,
    )
    t_build = time.time() - t0

    # --- device: witness completion (A·z ∘ B·z fills the product segment) ---
    be = get_backend(SCALAR)
    z0 = rng.integers(0, 1 << 16, size=(1 + N0 + R, 16)).astype(np.uint32)
    z0[0] = 0
    z0[0, 0] = 1  # ONE
    z0[N0 + 1 :] = 0  # product segment unknown
    z = jnp.asarray(z0)

    # Row-chunked layouts (a lax.scan over row blocks): the monolithic
    # eval's per-entry digit intermediates need ~54 GB of HLO temps at
    # 2^24 rows; chunked, only one block's temporaries are live. The
    # layout rides as a jit ARGUMENT (closures embed HLO literals and
    # overflow the compile transport at this size). The CHECK builds the
    # layout ONCE; witness completion reuses it at its own (smaller)
    # measured chunk optimum — ELL entries are stored flat, so one
    # upload serves both chunk counts.
    from bellpepper_tpu.backend.matvec import (
        build_row_chunked_check,
        build_row_chunked_product,
    )

    log2_rpc = int(sys.argv[3]) if len(sys.argv) > 3 else 19
    row_chunked = n_dev == 1 and log2_r >= 23
    t0 = time.time()
    reuse = None
    if row_chunked:
        check_fn, prep_chk = build_row_chunked_check(r1cs, max(1, R >> log2_rpc))
        check_jit = jax.jit(check_fn)
        reuse = (check_fn._layout_meta, prep_chk)

        def run_check(zz):
            return check_jit(zz, prep_chk)

    else:
        mesh = default_mesh(n_dev)
        sat = RowShardedSatisfier(r1cs, mesh)

        def run_check(zz):
            return sat._check(zz)

    t_shard_build = time.time() - t0

    # Witness completion (gather + Pallas modmul scan body) has its own
    # measured chunk optimum, smaller than the check's.
    n_wit_chunks = max(1, R >> min(log2_rpc, 17))
    t0 = time.time()
    prod_fn, prep_ab = build_row_chunked_product(
        r1cs, n_wit_chunks, reuse=reuse
    )
    t_wit_build = time.time() - t0

    from functools import partial

    # donate z: the update is in-place on device (saves one 1.1 GB copy)
    @partial(jax.jit, donate_argnums=(0,))
    def complete_witness(z, prep):
        return z.at[N0 + 1 :].set(prod_fn(z, prep))

    t0 = time.time()
    z = complete_witness(z, prep_ab)
    _ = int(jnp.sum(z[0, :1]))
    t_witness_first = time.time() - t0
    t0 = time.time()
    z2 = complete_witness(jnp.copy(z), prep_ab)
    _ = int(jnp.sum(z2[0, :1]))
    t_witness = time.time() - t0
    t0 = time.time()
    nb0, _f0 = run_check(z)
    ok = int(nb0) == 0
    t_check_first = time.time() - t0
    nb0, _f0 = run_check(z)  # second warm run (post-compile settling)
    ok = ok and int(nb0) == 0

    # Sync on the last rep only — an on-device verdict fold would put one
    # eager scalar dispatch (~45 ms tunnel round trip) per rep on the
    # critical path.
    n = 10
    t0 = time.time()
    nbs = []
    for _ in range(n):
        nb, _f = run_check(z)
        nbs.append(nb)
    jax.block_until_ready(nbs[-1])
    t_check = (time.time() - t0) / n
    bad = sum(int(x) for x in nbs)

    # corruption probe
    zb = z.at[5, 0].set(z[5, 0] ^ 1)
    nbb, _fb = run_check(zb)
    detected = int(nbb) > 0

    print(
        json.dumps(
            {
                "metric": "row-sharded synthetic R1CS constraint-evals/s",
                "value": round(R / t_check, 1),
                "unit": "constraints/s",
                "detail": {
                    "constraints": R,
                    "devices": n_dev,
                    "check_mode": "row-chunked-scan"
                    if row_chunked
                    else "row-sharded-mesh",
                    "satisfied": bool(ok) and bad == 0,
                    "corruption_detected": bool(detected),
                    "host_build_s": round(t_build, 3),
                    "witness_completion_s": round(t_witness, 4),
                    "shard_build_s": round(t_shard_build, 2),
                    "witness_layout_build_s": round(t_wit_build, 3),
                    "check_s": round(t_check, 4),
                    "end_to_end_s": round(
                        t_build + t_shard_build + t_wit_build + t_witness
                        + t_check,
                        2,
                    ),
                },
            }
        )
    )
    assert bool(ok) and bad == 0 and detected


if __name__ == "__main__":
    main()
