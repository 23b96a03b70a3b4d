#!/usr/bin/env python
"""Decompose config 1's trivial-limbs check by ROW CLASS: time the check
of (a) booleanity rows only, (b) trivial mul/add rows only, (c) the two
wide pack rows only, against the full 220-row check — locates the
non-kernel overhead the probe_config1 split exposed (26.5 ms check vs a
~5 ms mulcmp kernel budget at 2x8192 instances)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bellpepper_tpu.backend import matvec as mv
    from bellpepper_tpu.compile.pipeline import build_chunked_check
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
    from bellpepper_tpu.gadgets.multipack import pack_bits
    from bellpepper_tpu.r1cs import ShapeCS

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(128)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:64])
        b = pack_bits(cs.namespace("pb"), bs[64:])
        x = a
        for i in range(30):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"a{i}"), a)
            x = x.square(cs.namespace(f"s{i}"))

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)

    part = mv._classify_trivial_limb_rows(template)
    assert part is not None
    bit_rows, triv_rows, fold_idx = part
    print(
        f"rows: {len(bit_rows)} bit, {len(triv_rows)} trivial, "
        f"{len(fold_idx)} fold"
    )
    # split trivial rows into mul-like (B side has a variable) and
    # add-like (B side is constant ONE)
    n_add = sum(1 for (_r, _a, b, _c) in triv_rows if not b[1])
    print(f"trivial rows with constant B (add-like): {n_add}")

    B, n_chunks = 8192, 2
    rng = np.random.default_rng(5)
    free = jnp.asarray(
        rng.integers(0, 2, size=(n_chunks, B, 128)).astype(np.uint32)
    )
    evaluator = prog.build(True)
    n_ff = max(len(prog.free_field_slots), 1)

    @jax.jit
    def gen(free_bits):
        ff = jnp.zeros(free_bits.shape[:2] + (n_ff, 16), jnp.uint32)

        def body(carry, xs):
            fb, f = xs
            vals, flimbs = evaluator(fb, f)
            return carry, prog.z_template_limbs(vals, flimbs, f)

        _, out = jax.lax.scan(body, 0, (free_bits, ff))
        return out

    z4 = gen(free)
    jax.block_until_ready(z4)

    def timed(fn, *args, reps=8):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        jax.block_until_ready(outs[-1])
        return (time.time() - t0) / reps

    subsets = {
        "full (220 rows)": None,
        "bit rows only": np.asarray([r for r, _c in bit_rows], np.int64),
        "trivial rows only": np.asarray([r for r, *_ in triv_rows], np.int64),
        "fold (pack) rows only": np.asarray(fold_idx, np.int64),
    }
    for label, keep in subsets.items():
        t = template if keep is None else mv._sub_rows_r1cs(template, keep)
        chk = build_chunked_check(t, B, n_chunks, True, "limbs")
        dt = timed(chk, z4)
        nb, _ = chk(z4)
        print(f"{label:24s}: {dt*1e3:7.2f} ms  (bad={int(nb)})")


if __name__ == "__main__":
    main()
