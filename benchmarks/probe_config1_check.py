#!/usr/bin/env python
"""Sub-stage timing of the fused-limbs templated check for config 1:
where do the ~37 ms go? Times, per stage: the digit relayout, each
matrix's gather+fold-kernel matvec, and the final mulcmp."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

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

    B = 8192
    rng = np.random.default_rng(5)
    free = jnp.asarray(rng.integers(0, 2, size=(B, 128)).astype(np.uint32))
    ff = jnp.zeros((B, 1, 16), jnp.uint32)
    vals, flimbs = jax.jit(prog.build(True))(free, ff)
    z3 = jax.jit(prog.z_template_limbs)(vals, flimbs, ff)
    jax.block_until_ready(z3)
    print("z3", z3.shape)

    # Rebuild the internals the same way build_templated_check does.
    # NOTE: this hand-copies matvec.py's fused_limbs prep (zero_id handling,
    # digit relayout, per-bucket F matrices) and hard-codes the 'semi'
    # out_form + mulcmp, which is only valid for fields with NUM_BITS >= 250.
    # If matvec.py's fused_limbs block changes layout, update this probe.
    from bellpepper_tpu.backend import matvec as mv
    from bellpepper_tpu.backend.field_pallas import (
        SEMI,
        fold_digit_table,
        make_limbs_matvec_bucket,
        make_mulcmp,
    )
    from bellpepper_tpu.backend.field_jnp import get_backend

    be = get_backend(template.field)
    assert template.field.NUM_BITS >= 250, "semi/mulcmp path needs >=250-bit field"
    table = list(template.coeff_table)
    zero_id = table.index(0) if 0 in table else len(table)
    if zero_id == len(table):
        table.append(0)
    mats, pos_of_row, Rtp = mv._build_shared_ell(template, zero_id)
    fd = fold_digit_table(template.field, table)
    mulcmp = make_mulcmp(template.field)

    fl_mats = {}
    dev_cols = {}
    for name, m in mats.items():
        dev_cols[name] = jax.device_put(np.asarray(m.cols))
        entries = []
        cids_np = np.asarray(m.coeff_ids)
        for k, start, n_rows in m.buckets:
            cid_b = cids_np[start : start + n_rows * k].reshape(n_rows, k)
            F = fd[cid_b].transpose(3, 0, 1, 2).reshape(32, n_rows, k * 32).copy()
            entries.append(
                (
                    k,
                    start,
                    n_rows,
                    make_limbs_matvec_bucket(
                        template.field, k, n_rows, B, out_form="semi"
                    ),
                    jax.device_put(F),
                )
            )
        fl_mats[name] = entries
        print(name, "buckets:", [(k, n) for k, _s, n in m.buckets])

    def relayout(z3):
        zt = jnp.transpose(z3, (1, 2, 0))
        return jnp.stack([zt & 0xFF, (zt >> 8) & 0xFF], axis=2).reshape(
            zt.shape[0], 32, z3.shape[0]
        )

    def matvec(name, zd_all):
        parts = []
        zv = zd_all[dev_cols[name]]
        for k, start, n_rows, kern, F in fl_mats[name]:
            x = zv[start : start + n_rows * k].reshape(n_rows, k * 32, B)
            parts.append(kern(x, F))
        return jnp.concatenate(parts, axis=1)

    def timed(fn, *args, reps=6):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        jax.block_until_ready(outs[-1])
        return (time.time() - t0) / reps

    relay_j = jax.jit(relayout)
    t_relay = timed(relay_j, z3)
    zd = relay_j(z3)
    print(f"relayout : {t_relay*1e3:7.2f} ms   zd {zd.shape}")

    mv_j = jax.jit(matvec, static_argnums=0)
    for name in ("a", "b", "c"):
        t_mv = timed(mv_j, name, zd)
        print(f"matvec {name} : {t_mv*1e3:7.2f} ms")

    az = mv_j("a", zd).reshape(SEMI, Rtp * B)
    bz = mv_j("b", zd).reshape(SEMI, Rtp * B)
    cz = mv_j("c", zd).reshape(SEMI, Rtp * B)
    jax.block_until_ready((az, bz, cz))
    cmp_j = jax.jit(lambda a, b, c: jnp.sum((mulcmp(a, b, c) != 0)))
    t_cmp = timed(cmp_j, az, bz, cz)
    print(f"mulcmp   : {t_cmp*1e3:7.2f} ms   ({Rtp*B/1e6:.1f}M rows)")

    # gather-only cost
    g_j = jax.jit(lambda zd: zd[dev_cols["a"]].sum(dtype=jnp.uint32))
    t_g = timed(g_j, zd)
    print(f"gather a : {t_g*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
