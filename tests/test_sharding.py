"""Multi-chip sharding tests on a virtual 8-device CPU mesh: sharded
satisfiability and the full witness+check step must agree with the
single-device path (the extend-associativity property, SURVEY §3.3)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellpepper_tpu import SCALAR, WitnessCS
from bellpepper_tpu.backend.matvec import TemplatedSatisfier
from bellpepper_tpu.backend.sharding import (
    ShardedSatisfier,
    default_mesh,
    sharded_witness_and_check,
)
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multieq import MultiEq
from bellpepper_tpu.gadgets.uint32 import UInt32
from bellpepper_tpu.r1cs import ShapeCS

RNG = random.Random(0x5962BE3D)


def uint32_circuit(cs, vals=None):
    """Small uint32 template: xor + rotr + addmany (BASELINE config 2)."""
    ops = [
        UInt32.alloc(cs.namespace(f"op {i}"), None if vals is None else vals[i])
        for i in range(3)
    ]
    with MultiEq(cs) as mcs:
        x = ops[0].xor(mcs.namespace("xor"), ops[1].rotr(7))
        UInt32.addmany(mcs.namespace("add"), [x, ops[2].shr(3), ops[0]])


@pytest.fixture(scope="module")
def compiled():
    shape = ShapeCS()
    uint32_circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    uint32_circuit(tape)
    prog = WitnessProgram(tape)
    return template, prog


def make_witness_batch(prog, B):
    vals = [[RNG.randrange(1 << 32) for _ in range(3)] for _ in range(B)]
    free = np.array(
        [[(v >> i) & 1 for v in inst for i in range(32)] for inst in vals],
        dtype=np.uint32,
    )
    out_vals, flimbs = prog.run(free)
    z3 = prog.z_template_limbs(out_vals, flimbs)
    return vals, free, z3


def test_sharded_matches_single(compiled):
    template, prog = compiled
    assert len(jax.devices()) == 8
    B = 16
    _, _, z3 = make_witness_batch(prog, B)

    single = TemplatedSatisfier(template, B, use_pallas=False)
    assert single.is_satisfied(z3)

    mesh = default_mesh()
    sharded = ShardedSatisfier(template, B, mesh, use_pallas=False)
    zs = sharded.shard_z(z3)
    assert sharded.is_satisfied(zs)

    # Corrupt one instance on shard 5: both paths must reject, and the
    # sharded path must localize to the same (instance, constraint).
    z_bad = z3.at[11, 40, 0].set(z3[11, 40, 0] ^ 1)
    assert not single.is_satisfied(z_bad)
    zs_bad = sharded.shard_z(z_bad)
    assert not sharded.is_satisfied(zs_bad)
    s_which = sharded.which_is_unsatisfied(zs_bad)
    assert s_which is not None and s_which.startswith("instance 11:")


def test_sharded_witness_and_check_step(compiled):
    template, prog = compiled
    mesh = default_mesh()
    B = 24
    vals, free, z3_ref = make_witness_batch(prog, B)

    step, in_sharding = sharded_witness_and_check(
        prog, template, B, mesh, use_pallas=False
    )
    free_sharded = jax.device_put(jnp.asarray(free), in_sharding)
    n_bad, z = step(free_sharded)
    assert int(n_bad) == 0
    # Pure-bit circuit → step returns the bits form [B, S].
    assert prog.is_pure_bits and z.shape == (B, prog.num_slots)
    # Sharded witness == single-device witness, bit-exact.
    assert np.array_equal(np.asarray(z), np.asarray(z3_ref[..., 0]))

    # Host-oracle spot check of one instance.
    w = WitnessCS()
    uint32_circuit(w, vals[3])
    expect = w.inputs_slice() + w.aux_slice()
    got = [int(v) for v in np.asarray(z[3])]
    assert got == expect
    z3 = z3_ref

    # A corrupted free input must be caught by the fused step.
    free_bad = np.array(free)
    free_bad[7, 5] ^= 1
    # flipping an input bit changes the witness consistently -> still
    # satisfiable! Instead corrupt the witness post-generation:
    n_bad2, z3b = step(jax.device_put(jnp.asarray(free_bad), in_sharding))
    assert int(n_bad2) == 0  # consistent witness stays satisfiable

    sharded = ShardedSatisfier(template, B, mesh, use_pallas=False)
    z_bad = z3.at[7, 50, 0].set(z3[7, 50, 0] ^ 1)
    assert not sharded.is_satisfied(sharded.shard_z(z_bad))


def test_sharded_packed_step_matches_single(compiled):
    """The bit-sliced (packed) production step under shard_map must
    bit-equal single-device execution — witness words, verdict, and
    first-violation localization (the flagship path's multi-device
    program, VERDICT r4 item 2)."""
    from bellpepper_tpu.backend.matvec import build_templated_check
    from bellpepper_tpu.backend.sharding import (
        sharded_packed_witness_and_check,
    )
    from bellpepper_tpu.compile.witness_program import pack_bits

    template, prog = compiled
    assert prog.is_packable
    mesh = default_mesh()
    n_dev = mesh.devices.size
    B = 512 * n_dev  # minimum: one 512-instance check block per device
    free = np.array(
        [[RNG.randrange(2) for _ in range(len(prog.free_slots))] for _ in range(B)],
        dtype=np.uint32,
    )
    fp = pack_bits(jnp.asarray(free))  # [B/32, n_free]

    step, in_sharding = sharded_packed_witness_and_check(
        prog, template, B, mesh, use_pallas=False
    )
    n_bad, first, vals_p = step(jax.device_put(fp, in_sharding))
    assert int(n_bad) == 0 and int(first) == 0xFFFFFFFF

    # sharded packed witness == single-device packed witness, word-exact
    vals_single = prog.build_packed()(fp)
    assert np.array_equal(np.asarray(vals_p), np.asarray(vals_single))

    # corrupt one witness word bit on shard 6 and re-check via the
    # sharded verdict against the single-device reduced verdict
    word, slot, bit = (6 * 512 + 96) // 32, prog.num_slots - 2, 13
    vp_bad = vals_single.at[word, slot].set(
        vals_single[word, slot] ^ np.uint32(1 << bit)
    )
    viol = build_templated_check(template, B, False, "bits_packed")
    nb_ref, first_ref = jax.jit(viol.verdict)(vp_bad)
    assert int(nb_ref) > 0

    # drive the sharded checker on the corrupted witness: rebuild the
    # step's check stage only (witness regeneration would repair the
    # corruption), reusing the same shard_map structure via a mesh check
    local_b = B // n_dev
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local_viol = build_templated_check(template, local_b, False, "bits_packed")

    @partial(
        shard_map, mesh=mesh, in_specs=(P("data"),), out_specs=(P(), P()),
        check_vma=False,
    )
    def check_local(vp):
        nb, first = local_viol.verdict(vp)
        shard = jax.lax.axis_index("data").astype(jnp.uint32)
        Rt = template.num_constraints
        first = jnp.where(
            nb > 0,
            first + shard * jnp.uint32(local_b * Rt),
            jnp.uint32(0xFFFFFFFF),
        )
        return jax.lax.psum(nb, "data")[None], jax.lax.pmin(first, "data")[None]

    nb_s, first_s = jax.jit(check_local)(
        jax.device_put(vp_bad, jax.sharding.NamedSharding(mesh, P("data")))
    )
    assert int(nb_s[0]) == int(nb_ref)
    assert int(first_s[0]) == int(first_ref)


def test_bits_fast_path_matches_limbs(compiled):
    """witness_form='bits' must agree with the general limbs path,
    including corruption localization."""
    template, prog = compiled
    B = 6
    _, free, z3 = make_witness_batch(prog, B)
    vals, _ = prog.run(free)

    limbs_sat = TemplatedSatisfier(template, B, use_pallas=False, witness_form="limbs")
    bits_sat = TemplatedSatisfier(template, B, use_pallas=False, witness_form="bits")
    assert limbs_sat.is_satisfied(z3)
    assert bits_sat.is_satisfied(vals)

    bad_vals = vals.at[2, 37].set(vals[2, 37] ^ 1)
    bad_z3 = z3.at[2, 37, 0].set(z3[2, 37, 0] ^ 1)
    w_l = limbs_sat.which_is_unsatisfied(bad_z3)
    w_b = bits_sat.which_is_unsatisfied(bad_vals)
    assert w_l is not None and w_l == w_b


def test_scaling_efficiency_shape(compiled):
    """Mesh subsets of different sizes produce identical verdicts."""
    template, prog = compiled
    B = 8
    _, _, z3 = make_witness_batch(prog, B)
    for n_dev in (1, 2, 4, 8):
        mesh = default_mesh(n_dev)
        s = ShardedSatisfier(template, B, mesh, use_pallas=False)
        assert s.is_satisfied(s.shard_z(z3))
