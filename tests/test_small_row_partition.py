"""Bits-form small-row partition: rows with small signed-coefficient
bounds are checked exactly in int32 (matvec._classify_small_rows), the
rest through the full limb pipeline. The partitioned mask must be
bit-identical to the unpartitioned one, per row, for satisfied AND
corrupted witnesses — including corruptions that only violate a BIG
(MultiEq-packed) row.

Replaces-the-hot-loop-of: test_cs.rs:239-253."""

import jax
import jax.numpy as jnp
import numpy as np

from bellpepper_tpu.backend.matvec import (
    _classify_small_rows,
    build_templated_check,
)
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.multieq import MultiEq
from bellpepper_tpu.gadgets.uint32 import UInt32
from bellpepper_tpu.r1cs import ShapeCS


def _template():
    """addmany circuit: booleanity rows (small) + MultiEq rows (big)."""

    def circuit(cs):
        words = [UInt32.alloc(cs.namespace(f"w{i}"), None) for i in range(3)]
        with MultiEq(cs) as mcs:
            acc = words[0]
            for i in range(1, 3):
                acc = UInt32.addmany(
                    mcs.namespace(f"add {i}"), [acc, words[i]]
                )

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    return template, WitnessProgram(tape)


def test_partition_finds_both_classes():
    template, _ = _template()
    part = _classify_small_rows(template)
    assert part is not None
    small_idx, big_idx, _lay = part
    assert len(small_idx) + len(big_idx) == template.num_constraints
    assert len(small_idx) > 0 and len(big_idx) > 0, (
        "the addmany template must exercise both row classes"
    )


def test_partitioned_mask_matches_unpartitioned():
    template, prog = _template()
    B = 4
    rng = np.random.default_rng(42)
    free = jnp.asarray(
        rng.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    )
    vals, _ = prog.run(free)
    vals = jnp.asarray(vals)

    v_split = build_templated_check(template, B, False, "bits")
    v_plain = build_templated_check(
        template, B, False, "bits", _partition=False
    )
    ok = np.asarray(jax.jit(v_split)(vals))
    assert not ok.any(), "witness must satisfy"
    np.testing.assert_array_equal(ok, np.asarray(jax.jit(v_plain)(vals)))

    part = _classify_small_rows(template)
    small_idx, big_idx, _lay = part
    # corrupt one bit per instance — masks must agree exactly, and at
    # least one corruption must trip a BIG row (addmany result bit feeds
    # the packed MultiEq equality)
    tripped_big = False
    for slot in (5, 40, int(np.asarray(prog.free_slots)[-1]) + 1):
        vb = vals.at[1, slot].set(vals[1, slot] ^ 1)
        m_split = np.asarray(jax.jit(v_split)(vb))
        m_plain = np.asarray(jax.jit(v_plain)(vb))
        np.testing.assert_array_equal(m_split, m_plain)
        assert m_split.any(), "corruption must be detected"
        rows_hit = np.nonzero(m_split.reshape(B, template.num_constraints))[1]
        if np.isin(rows_hit, big_idx).any():
            tripped_big = True
    assert tripped_big, "no corruption reached a packed (big) row"
