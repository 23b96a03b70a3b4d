"""The MIXED witness form (u32 buffer + field-limb sidecar) must agree
with the limbs form — the general field-circuit pipeline — on valid
witnesses and under corruption of every slot, for every row class it
routes: booleanity (u32 compare), linear rows (Montgomery zero-test),
product rows (fused mul-compare), pack/MultiEq integer rows (window
sums), and fallback rows (remapped limbs sub-check).

Reference semantics: each row is the field equation A·z ∘ B·z = C·z
(test_cs.rs:239-253); the mixed form is a re-layout, not a semantic
change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellpepper_tpu.backend.matvec import (
    _classify_mixed_rows,
    build_templated_check,
)
from bellpepper_tpu.compile.tape import TapeCS
from bellpepper_tpu.compile.witness_program import WitnessProgram
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.multipack import pack_bits
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.r1cs import ShapeCS

RNG = np.random.default_rng(0x11C0FFEE)


def _compile(circuit):
    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    return template, prog


def _field_slots(prog):
    return sorted(prog.field_rows, key=prog.field_rows.get) + list(
        prog.free_field_slots
    )


def _run_mixed_vs_limbs(template, prog, B, free, n_corrupt=40):
    """Compare mixed vs limbs masks on a valid witness and under
    random single-entry corruptions of vals and flimbs."""
    fs = _field_slots(prog)
    vals, flimbs = prog.run(free)
    ff = jnp.zeros((B, max(len(prog.free_field_slots), 1), 16), jnp.uint32)
    if prog.free_field_slots:
        flimbs_all = jnp.concatenate([flimbs, ff], axis=1)
    else:
        flimbs_all = flimbs
    z3 = prog.z_template_limbs(vals, flimbs, ff)

    viol_m = jax.jit(
        build_templated_check(template, B, False, "mixed", field_slots=fs)
    )
    viol_l = jax.jit(build_templated_check(template, B, False, "limbs"))
    m_m = np.asarray(viol_m(vals, flimbs_all))
    m_l = np.asarray(viol_l(z3))
    assert m_l.sum() == 0, "witness must satisfy the template"
    assert (m_m == m_l).all()

    S = prog.num_slots
    fs_set = set(fs)
    for _ in range(n_corrupt):
        b = int(RNG.integers(0, B))
        s = int(RNG.integers(1, S))
        if s in fs_set:
            row = fs.index(s)
            limb = int(RNG.integers(0, 16))
            delta = np.uint32(RNG.integers(1, 0xFFFF))
            # canonical-domain corruption: flip low limbs only (keeps
            # the value < p with overwhelming probability for these
            # templates; skip if it would exceed p)
            fl_bad = flimbs_all.at[b, row, limb].set(
                flimbs_all[b, row, limb] ^ delta
            )
            val_int = sum(
                int(fl_bad[b, row, i]) << (16 * i) for i in range(16)
            )
            if val_int >= template.field.p:
                continue
            vals_bad = vals.at[b, s].set(
                fl_bad[b, row, 0] | (fl_bad[b, row, 1] << 16)
            )
            z3_bad = z3.at[b, s].set(fl_bad[b, row, :])
            m_m = np.asarray(viol_m(vals_bad, fl_bad))
        else:
            delta = np.uint32(RNG.integers(1, 1 << 31))
            vals_bad = vals.at[b, s].set(vals[b, s] ^ delta)
            z3_bad = z3.at[b, s, 0].set(vals_bad[b, s] & 0xFFFF)
            z3_bad = z3_bad.at[b, s, 1].set(vals_bad[b, s] >> 16)
            m_m = np.asarray(viol_m(vals_bad, flimbs_all))
        m_l = np.asarray(viol_l(z3_bad))
        assert (m_m == m_l).all(), f"mismatch corrupting slot {s}"
    return m_m


def test_mixed_config1_shape():
    """config 1's circuit: booleanity + pack + mul/add/square chain —
    routes bool_u32, pow2 (pack), lin (add), mul (mul/square)."""

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(32)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:16])
        b = pack_bits(cs.namespace("pb"), bs[16:])
        x = a
        for i in range(4):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"a{i}"), a)
            x = x.square(cs.namespace(f"s{i}"))

    template, prog = _compile(circuit)
    fs = _field_slots(prog)
    cls = _classify_mixed_rows(template, fs)
    assert len(cls["bool_u32"]) == 32
    assert len(cls["pow2"]) == 2  # the two pack rows
    assert len(cls["lin"]) == 4  # the add rows
    assert len(cls["mul"]) == 8  # mul + square rows
    assert len(cls["rest"]) == 0

    B = 16
    free = RNG.integers(0, 2, size=(B, 32)).astype(np.uint32)
    _run_mixed_vs_limbs(template, prog, B, free)


def test_mixed_select_and_nonzero():
    """conditionally_reverse (select) and assert_nonzero rows route to
    the mul class; inputize-free Num circuits keep exactness."""

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(17)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:8])
        b = pack_bits(cs.namespace("pb"), bs[8:16])
        c, d = AllocatedNum.conditionally_reverse(
            cs.namespace("rev"), a, b, bs[16]
        )
        e = c.mul(cs.namespace("m"), d)
        e.assert_nonzero(cs.namespace("nz"))

    template, prog = _compile(circuit)
    fs = _field_slots(prog)
    cls = _classify_mixed_rows(template, fs)
    assert len(cls["rest"]) == 0, "all rows should route to fast classes"

    B = 8
    free = RNG.integers(0, 2, size=(B, 17)).astype(np.uint32)
    # assert_nonzero needs e != 0: force at least one packed bit set
    free[:, 0] = 1
    free[:, 8] = 1
    _run_mixed_vs_limbs(template, prog, B, free)


def test_mixed_pow2_exactness_u32_corruption():
    """The pow2 integer row check must stay exact when a 'bit' slot is
    corrupted to a LARGE u32 value (the mixed domain allows any value
    < 2^32 in u32 slots): Σ 2^i·v_i is then a big integer whose mod-p
    comparison the window sums + Montgomery test must get right."""

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(16)
        ]
        pack_bits(cs.namespace("p"), bs)

    template, prog = _compile(circuit)
    fs = _field_slots(prog)
    B = 4
    free = RNG.integers(0, 2, size=(B, 16)).astype(np.uint32)
    vals, flimbs = prog.run(free)
    viol_m = jax.jit(
        build_templated_check(template, B, False, "mixed", field_slots=fs)
    )
    assert np.asarray(viol_m(vals, flimbs)).sum() == 0

    pack_row = 16  # after the 16 booleanity rows
    for big in (2, 0xFFFFFFFF, 1 << 16):
        vals_bad = vals.at[1, 3].set(np.uint32(big))
        m = np.asarray(viol_m(vals_bad, flimbs)).reshape(
            B, template.num_constraints
        )
        # booleanity row 2 (slot 3 = bit b2) must fire, and the pack row
        # must fire iff the integer sum no longer matches mod p
        assert m[1, 2], f"booleanity must catch {big}"
        z = [int(v) for v in np.asarray(vals_bad[1, 1:])]
        # host ground truth
        ok, first = template.eval_host(
            [1],
            [
                int(v)
                if (s + 1) not in fs
                else sum(
                    int(flimbs[1, fs.index(s + 1), i]) << (16 * i)
                    for i in range(16)
                )
                for s, v in enumerate(z)
            ],
        )
        exp_bad_rows = set()
        if not ok:
            # recompute full mask on host
            p = template.field.p
            for r in range(template.num_constraints):
                okr, _ = template.eval_host(
                    [1],
                    [
                        int(v)
                        if (s + 1) not in fs
                        else sum(
                            int(flimbs[1, fs.index(s + 1), i]) << (16 * i)
                            for i in range(16)
                        )
                        for s, v in enumerate(z)
                    ],
                )
                break
        got_pack = bool(m[1, pack_row])
        # compute expected pack-row verdict on host
        p = template.field.p
        lhs = sum(int(vals_bad[1, 1 + i]) << i for i in range(16)) % p
        rhs = sum(int(flimbs[1, 0, i]) << (16 * i) for i in range(16)) % p
        assert got_pack == (lhs != rhs), f"pack row wrong for {big}"


def test_mixed_fallback_rows():
    """Rows no fast class matches (a 3-term LC product) must fall back
    to the remapped limbs sub-check and stay exact."""
    from bellpepper_tpu.constraint_system import ConstraintSystem

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(16)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:8])
        b = pack_bits(cs.namespace("pb"), bs[8:])
        c = a.mul(cs.namespace("m"), b)
        # 3-variable LC on A: (a + b + c) · 1 = d  — too wide for the
        # trivial classes with a 3rd term, lands in rest
        d = a.add(cs.namespace("ad"), b).add(cs.namespace("ad2"), c)

    template, prog = _compile(circuit)
    fs = _field_slots(prog)
    cls = _classify_mixed_rows(template, fs)
    # the 3-term adds produce at least one rest or lin row; exactness is
    # what matters — run the full comparison
    B = 8
    free = RNG.integers(0, 2, size=(B, 16)).astype(np.uint32)
    _run_mixed_vs_limbs(template, prog, B, free)


def test_templated_satisfier_mixed_form():
    """TemplatedSatisfier accepts the (vals, flimbs) pair directly with
    witness_form='mixed' — the user-facing API over the mixed check."""
    from bellpepper_tpu.backend.matvec import TemplatedSatisfier

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(16)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:8])
        b = pack_bits(cs.namespace("pb"), bs[8:])
        a.mul(cs.namespace("m"), b).square(cs.namespace("s"))

    template, prog = _compile(circuit)
    fs = _field_slots(prog)
    B = 8
    free = RNG.integers(0, 2, size=(B, 16)).astype(np.uint32)
    vals, flimbs = prog.run(free)
    sat = TemplatedSatisfier(
        template, B, use_pallas=False, witness_form="mixed", field_slots=fs
    )
    assert sat.is_satisfied((vals, flimbs))
    fl_bad = flimbs.at[2, 2, 0].set(flimbs[2, 2, 0] ^ 1)
    which = sat.which_is_unsatisfied((vals, fl_bad))
    assert which is not None and which.startswith("instance 2:")


def test_mixed_matches_host_oracle_end_to_end():
    """Mixed-form verdict against R1CS.eval_host for random instances of
    a field circuit (ground truth beyond the limbs-path comparison)."""

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(24)
        ]
        a = pack_bits(cs.namespace("pa"), bs[:12])
        b = pack_bits(cs.namespace("pb"), bs[12:])
        x = a.mul(cs.namespace("m0"), b).add(cs.namespace("a0"), a)
        x.square(cs.namespace("s0"))

    template, prog = _compile(circuit)
    fs = _field_slots(prog)
    B = 8
    free = RNG.integers(0, 2, size=(B, 24)).astype(np.uint32)
    vals, flimbs = prog.run(free)
    viol = jax.jit(
        build_templated_check(template, B, False, "mixed", field_slots=fs)
    )
    m = np.asarray(viol(vals, flimbs)).reshape(B, template.num_constraints)
    for i in range(B):
        aux = [
            int(vals[i, s])
            if s not in fs
            else sum(
                int(flimbs[i, fs.index(s), k]) << (16 * k) for k in range(16)
            )
            for s in range(1, prog.num_slots)
        ]
        ok, first = template.eval_host([1], aux)
        assert ok == (not m[i].any())
    assert m.sum() == 0
