#!/usr/bin/env python
"""Probe: MultiEq packed-row check — XLA plane lowering vs the Pallas
bit-plane equality kernel, on the flagship sha256 template at chunk
batch sizes. Prints per-variant ms/chunk and the parity verdict.

Usage: python benchmarks/probe_pow2_kernel.py [batches...] (default 32768)
"""

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
    batches = [int(a) for a in sys.argv[1:]] or [32768]
    import jax
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import (
        _classify_pow2_eq_rows,
        _classify_small_rows,
        _pow2_eq_bad_words,
        _pow2_eq_bad_words_pallas,
    )
    from bellpepper_tpu.native import NativeBuilder

    nb = NativeBuilder()
    in_bits = [nb.alloc_bit() for _ in range(512)]
    nb.sha256_compression(in_bits, nb.sha256_iv())
    template, _tape = nb.finish()
    _small, big_idx, _lay = _classify_small_rows(template)
    spec, _rest = _classify_pow2_eq_rows(template, big_idx)
    n = len(spec["rows_orig"])
    print(
        f"pow2 rows={n} n_pos={spec['n_pos']} "
        f"m_a={spec['a_cols'].shape[2]} m_c={spec['c_cols'].shape[2]}"
    )
    S_t = template.num_inputs + template.num_aux
    rng = np.random.default_rng(0x5962BE3D)
    on_tpu = jax.default_backend() == "tpu"

    for B in batches:
        Bw = B // 32
        vals = rng.integers(0, 1 << 32, size=(S_t, Bw), dtype=np.uint64)
        vals = vals.astype(np.uint32)
        vals[0] = 0xFFFFFFFF
        vp = jax.device_put(jnp.asarray(vals))

        xla = jax.jit(lambda v: jnp.sum(_pow2_eq_bad_words(v, spec),
                                        dtype=jnp.uint32))
        pal = jax.jit(
            lambda v: jnp.sum(
                _pow2_eq_bad_words_pallas(v, spec, interpret=not on_tpu),
                dtype=jnp.uint32,
            )
        )
        # parity (also performs the first real fetch so timing is valid)
        mx = np.asarray(
            jax.jit(lambda v: _pow2_eq_bad_words(v, spec))(vp)
        )
        mp = np.asarray(
            jax.jit(
                lambda v: _pow2_eq_bad_words_pallas(
                    v, spec, interpret=not on_tpu
                )
            )(vp)
        )
        ok = (mx == mp).all()
        for name, fn in (("xla", xla), ("pallas", pal)):
            r = int(fn(vp))  # compile + warm fetch
            reps = 20
            t0 = time.time()
            for _ in range(reps - 1):
                acc = fn(vp)
            r2 = int(acc)
            dt = (time.time() - t0) / (reps - 1)
            print(
                f"B={B}: {name:6s} {dt*1e3:8.2f} ms/chunk  "
                f"({B*n/dt/1e9:.2f}G row-evals/s)  checksum={r}"
            )
        print(f"B={B}: parity {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
