"""MIXED packed layout: bit slots bit-sliced 32 instances/word, field
-valued pack outputs (multipack.rs:76-105) in an unpacked limb sidecar.
The evaluator must match the plain evaluator bit/limb-exactly and the
sidecar check must match ground-truth field semantics under corruption
of bit words AND field limbs."""

import jax
import jax.numpy as jnp
import numpy as np

from bellpepper_tpu.backend.matvec import build_templated_check
from bellpepper_tpu.compile.pipeline import build_packed_production_step
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import (
    WitnessProgram,
    pack_bits,
    unpack_bits,
)
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multieq import MultiEq
from bellpepper_tpu.gadgets.multipack import pack_into_inputs, pack_bits as gpack
from bellpepper_tpu.gadgets.uint32 import UInt32
from bellpepper_tpu.r1cs import ShapeCS

RNG = np.random.default_rng(0xC0FFEE42)


def _setup():
    """config-3 shape: multieq-batched addmany + multipack of results."""

    def circuit(cs):
        words = [UInt32.alloc(cs.namespace(f"w{i}"), None) for i in range(4)]
        with MultiEq(cs) as mcs:
            acc = words[0]
            for i in range(1, 4):
                acc = UInt32.addmany(mcs.namespace(f"add {i}"), [acc, words[i]])
        gpack(cs.namespace("pack"), acc.into_bits())
        gpack(cs.namespace("pack2"), words[0].into_bits())

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    return template, WitnessProgram(tape)


def _field_slots(prog):
    return sorted(prog.field_rows, key=prog.field_rows.get)


def test_mixed_packed_evaluator_matches_plain():
    template, prog = _setup()
    assert not prog.is_packable and prog.is_packable_mixed
    B = 96
    free = RNG.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vals_ref, flimbs_ref = prog.run(free)
    vp, fl = prog.build_packed_mixed()(pack_bits(jnp.asarray(free)))
    vals_up = np.asarray(unpack_bits(vp))
    ref = np.asarray(vals_ref)
    fs = _field_slots(prog)
    # bit slots word-exact; field-out slots hold 0 in the packed buffer
    mask = np.ones(prog.num_slots, bool)
    mask[fs] = False
    assert (vals_up[:, mask] == ref[:, mask]).all()
    assert (vals_up[:, ~mask] == 0).all()
    assert (np.asarray(fl) == np.asarray(flimbs_ref)).all()


def test_mixed_packed_check_matches_ground_truth():
    template, prog = _setup()
    fs = _field_slots(prog)
    B = 512
    free = RNG.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vp, fl = prog.build_packed_mixed()(pack_bits(jnp.asarray(free)))
    viol = build_templated_check(
        template, B, False, "bits_packed", field_slots=fs
    )
    viol_j = jax.jit(viol)
    verdict_j = jax.jit(viol.verdict)
    m = np.asarray(viol_j(vp, fl)).reshape(B, template.num_constraints)
    assert m.sum() == 0
    nb, first = verdict_j(vp, fl)
    assert int(nb) == 0 and int(first) == 0xFFFFFFFF

    # corrupt a field limb → the pack row must fire, nothing else
    pack_rows = [
        r
        for r in range(template.num_constraints)
        if template.names is None
    ]
    fl_bad = fl.at[37, 0, 3].set(fl[37, 0, 3] ^ np.uint32(0x20))
    m = np.asarray(viol_j(vp, fl_bad)).reshape(B, template.num_constraints)
    assert m.sum() == 1 and m[37].sum() == 1
    bad_row = int(np.argmax(m[37]))
    nb, first = verdict_j(vp, fl_bad)
    assert int(nb) == 1
    assert int(first) == 37 * template.num_constraints + bad_row

    # corrupt a bit word (a bit feeding the pack AND other rows):
    # verdict must equal the full-mask reduction
    vp_bad = vp.at[3, 5].set(vp[3, 5] ^ np.uint32(1 << 11))
    m = np.asarray(viol_j(vp_bad, fl)).reshape(B, template.num_constraints)
    nb, first = verdict_j(vp_bad, fl)
    assert int(nb) == m.sum() > 0
    flat = np.nonzero(m.reshape(-1))[0]
    assert int(first) == int(flat.min())

    # ground truth for a corrupted instance via eval_host
    inst = 32 * 3 + 11
    z_bits = np.asarray(unpack_bits(vp_bad))[inst]
    aux = []
    for s in range(1, prog.num_slots):
        if s in fs:
            row = fs.index(s)
            aux.append(
                sum(int(fl[inst, row, i]) << (16 * i) for i in range(16))
            )
        else:
            aux.append(int(z_bits[s]))
    ok, _ = template.eval_host([1], aux)
    assert ok == (not m[inst].any())


def test_mixed_packed_production_step():
    template, prog = _setup()
    B, n_chunks = 512, 2
    free = RNG.integers(
        0, 1 << 32, size=(n_chunks, B // 32, len(prog.free_slots)),
        dtype=np.uint64,
    ).astype(np.uint32)
    step = build_packed_production_step(prog, template, B, use_pallas=False)
    total, _first = step(jnp.asarray(free))
    assert int(total) == 0


def test_mixed_packed_sharded_step():
    """The sharded packed step must route field-bearing bit templates
    (multipack outputs) through the MIXED packed layout and agree with
    single-device execution."""
    from bellpepper_tpu.backend.sharding import (
        default_mesh,
        sharded_packed_witness_and_check,
    )

    template, prog = _setup()
    mesh = default_mesh()
    n_dev = mesh.devices.size
    B = 512 * n_dev
    free = RNG.integers(0, 2, size=(B, len(prog.free_slots))).astype(
        np.uint32
    )
    fp = pack_bits(jnp.asarray(free))
    step, in_sharding = sharded_packed_witness_and_check(
        prog, template, B, mesh, use_pallas=False
    )
    n_bad, first, vals_p = step(jax.device_put(fp, in_sharding))
    assert int(n_bad) == 0 and int(first) == 0xFFFFFFFF
    vals_single, _fl = prog.build_packed_mixed()(fp)
    assert np.array_equal(np.asarray(vals_p), np.asarray(vals_single))
