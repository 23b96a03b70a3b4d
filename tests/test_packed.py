"""Bit-sliced (packed) witness generation + bits_packed check.

The packed evaluator stores 32 instances per uint32 word (batch-axis
bit-slicing); it must reproduce the plain evaluator bit-exactly, and the
bits_packed templated check must produce the same violation mask as the
bits form — for satisfied AND corrupted witnesses, including corruptions
that only violate a big (MultiEq-packed) row.

Covers the TPU-shape of the reference's SizedWitness straight-line
generation (witness_cs.rs:7-41) at 1/32nd the HBM traffic."""

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
from bellpepper_tpu.gadgets.uint32 import UInt32
from bellpepper_tpu.r1cs import ShapeCS

RNG = np.random.default_rng(0x5962BE3D)


def _addmany_setup():
    """addmany circuit: booleanity/xor rows (small) + MultiEq rows (big)."""

    def circuit(cs):
        words = [UInt32.alloc(cs.namespace(f"w{i}"), None) for i in range(3)]
        with MultiEq(cs) as mcs:
            acc = words[0]
            for i in range(1, 3):
                acc = UInt32.addmany(mcs.namespace(f"add {i}"), [acc, words[i]])
            acc.xor(mcs.namespace("x"), words[0].rotr(5))

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    return template, WitnessProgram(tape)


def test_pack_unpack_roundtrip():
    bits = RNG.integers(0, 2, size=(128, 37)).astype(np.uint32)
    packed = pack_bits(jnp.asarray(bits))
    assert packed.shape == (4, 37)
    back = np.asarray(unpack_bits(packed))
    assert (back == bits).all()


def test_packed_evaluator_matches_plain_bit_ops():
    def circuit(cs):
        bits = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(8)
        ]
        x = Boolean.xor(cs.namespace("x"), bits[0], bits[1])
        y = Boolean.and_(cs.namespace("y"), x, bits[2].not_())
        z = Boolean.and_(cs.namespace("z"), bits[3].not_(), bits[4].not_())
        ch = Boolean.sha256_ch(cs.namespace("ch"), y, z, bits[5])
        Boolean.sha256_maj(cs.namespace("maj"), ch, bits[6], bits[7].not_())

    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    assert prog.is_packable
    B = 64
    free = RNG.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vals_ref, _ = prog.run(free)
    vp = prog.build_packed()(pack_bits(jnp.asarray(free)))
    assert (np.asarray(unpack_bits(vp)) == np.asarray(vals_ref)).all()


def test_packed_evaluator_matches_plain_addmany():
    template, prog = _addmany_setup()
    assert prog.is_packable
    B = 96
    free = RNG.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vals_ref, _ = prog.run(free)
    vp = prog.build_packed()(pack_bits(jnp.asarray(free)))
    assert (np.asarray(unpack_bits(vp)) == np.asarray(vals_ref)).all()


def _packed_z(prog, B):
    free = RNG.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    return prog.build_packed()(pack_bits(jnp.asarray(free)))


def test_bits_packed_mask_matches_bits():
    template, prog = _addmany_setup()
    for B in (512, 1024):  # one block / two blocks (exercises lax.map)
        vp = _packed_z(prog, B)  # [B/32, S]
        viol_p = build_templated_check(template, B, False, "bits_packed")
        viol_u = build_templated_check(template, B, False, "bits")
        zb = jnp.asarray(unpack_bits(vp))  # [B, S]
        m_u = np.asarray(jax.jit(viol_u)(zb))
        m_p = np.asarray(jax.jit(viol_p)(vp))
        assert m_u.sum() == 0, "witness must satisfy the template"
        assert (m_u == m_p).all()

        # Corrupt one witness bit (a small booleanity row's variable) and
        # one bit that only violates big MultiEq rows (an addmany result
        # bit participates in both; flipping a free input bit feeds both
        # row classes) — masks must stay identical and nonzero.
        for slot, word, bit in ((5, 2, 7), (prog.num_slots - 2, 0, 31)):
            vpb = vp.at[word, slot].set(vp[word, slot] ^ np.uint32(1 << bit))
            zbb = jnp.asarray(unpack_bits(vpb))
            m_u = np.asarray(jax.jit(viol_u)(zbb))
            m_p = np.asarray(jax.jit(viol_p)(vpb))
            assert m_u.sum() > 0
            assert (m_u == m_p).all()


def _families_setup():
    """Circuit exercising every structured row family: booleanity, xor,
    and, and_not, nor, ch, maj (rows 1+2), plus MultiEq big rows."""

    def circuit(cs):
        bits = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(12)
        ]
        x = Boolean.xor(cs.namespace("x"), bits[0], bits[1])
        y = Boolean.and_(cs.namespace("y"), x, bits[2].not_())  # and_not
        z = Boolean.and_(cs.namespace("z"), bits[3].not_(), bits[4].not_())  # nor
        w = Boolean.and_(cs.namespace("w"), bits[5], bits[6])  # and
        ch = Boolean.sha256_ch(cs.namespace("ch"), y, z, bits[7])
        mj = Boolean.sha256_maj(cs.namespace("maj"), ch, w, bits[8])
        words = [UInt32.alloc(cs.namespace(f"u{i}"), None) for i in range(2)]
        with MultiEq(cs) as mcs:
            acc = UInt32.addmany(mcs.namespace("s"), words)
            acc.xor(mcs.namespace("ux"), words[0].rotr(3))
        Boolean.xor(cs.namespace("fin"), mj, bits[9])

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    return template, WitnessProgram(tape)


def test_packed_families_cover_and_match():
    """The family classifier must match ch/maj/nor/and_not rows of this
    circuit, and the packed mask must stay bit-identical to the bits
    form under corruption of EVERY witness slot (one at a time for a
    fixed instance) — the strongest family-rewrite soundness check."""
    from bellpepper_tpu.backend.matvec import (
        _classify_bit_row_families,
        _classify_small_rows,
    )

    template, prog = _families_setup()
    small_idx, _big, _lay = _classify_small_rows(template)
    fams, leftover = _classify_bit_row_families(template, small_idx)
    for kind in ("bool", "xor", "and", "and_not", "nor", "ch", "maj2"):
        assert kind in fams, f"family {kind} not matched"
    # rows with folded negations (e.g. maj over a Not operand) fall to
    # the generic path — this circuit has none, so coverage is total
    assert len(leftover) == 0, "every small row should match a family"

    B = 512
    vp = _packed_z(prog, B)
    viol_p = jax.jit(build_templated_check(template, B, False, "bits_packed"))
    viol_u = jax.jit(build_templated_check(template, B, False, "bits"))
    m_p0 = np.asarray(viol_p(vp))
    m_u0 = np.asarray(viol_u(jnp.asarray(unpack_bits(vp))))
    assert m_u0.sum() == 0 and (m_p0 == m_u0).all()
    for slot in range(1, prog.num_slots):
        vpb = vp.at[3, slot].set(vp[3, slot] ^ np.uint32(1 << 21))
        m_p = np.asarray(viol_p(vpb))
        m_u = np.asarray(viol_u(jnp.asarray(unpack_bits(vpb))))
        assert (m_p == m_u).all(), f"mask mismatch corrupting slot {slot}"


def test_pow2_eq_pallas_matches_xla():
    """The Pallas bit-plane equality kernel (interpret mode) must equal
    the XLA plane lowering bit-for-bit: zero bad words on a valid packed
    witness, identical words under single-bit corruption, and identical
    words on fully random inputs (the function is total over words)."""
    from bellpepper_tpu.backend.matvec import (
        _classify_pow2_eq_rows,
        _classify_small_rows,
        _pow2_eq_bad_words,
        _pow2_eq_bad_words_pallas,
    )

    template, prog = _addmany_setup()
    _small, big_idx, _lay = _classify_small_rows(template)
    spec, _rest = _classify_pow2_eq_rows(template, big_idx)
    assert spec is not None and len(spec["rows_orig"]) > 0
    B = 512
    vp = _packed_z(prog, B)  # [B/32, S]

    def both(vals_bm):
        vals_p = jnp.asarray(vals_bm).T  # slot-major [S, B/32]
        ref = np.asarray(_pow2_eq_bad_words(vals_p, spec))
        new = np.asarray(
            _pow2_eq_bad_words_pallas(vals_p, spec, interpret=True)
        )
        assert (ref == new).all()
        return ref

    assert both(vp).sum() == 0  # valid witness: no violations
    # corrupt a slot that participates in a MultiEq row (from the spec)
    cols = spec["a_cols"][spec["a_mask"] != 0]
    slot = int(cols[cols > 0][0])
    bad = both(vp.at[2, slot].set(vp[2, slot] ^ np.uint32(1 << 9)))
    assert bad.sum() > 0
    # random words (ONE slot all-ones, as the packed layout guarantees)
    rand = RNG.integers(
        0, 1 << 32, size=(B // 32, prog.num_slots), dtype=np.uint64
    ).astype(np.uint32)
    rand[:, 0] = 0xFFFFFFFF
    both(jnp.asarray(rand))


def _check_mc2_kernel(m_a, m_c, n_pos, expected_P, max_bit):
    """m_c > 1 takes the two's-complement (mod 2^P) kernel form, which
    no gadget circuit here produces — verify it against exact integer
    arithmetic on synthetic planes, for equal and unequal sides."""
    from bellpepper_tpu.backend.field_pallas import make_bitplane_eq_kernel

    kern = make_bitplane_eq_kernel(n_pos, m_a, m_c, interpret=True)
    P = kern.n_pos_padded
    assert P == expected_P
    W = 512

    # random addend planes with bits only below max_bit so every side's
    # value < (m+1)·2^max_bit < 2^P (the classifier's soundness condition)
    def rand_planes(m):
        pl_ = np.zeros((m, P, W), np.uint32)
        pl_[:, :max_bit] = (
            RNG.integers(0, 1 << 32, size=(m, max_bit, W), dtype=np.uint64)
            .astype(np.uint32)
        )
        return pl_

    def values(pl_):
        """exact per-(column, bit-lane) integer value of Σ_k Σ_e 2^e·bit"""
        tot = np.zeros((W, 32), object)
        for k in range(pl_.shape[0]):
            for e in range(P):
                bits = (pl_[k, e][:, None] >> np.arange(32)) & 1
                tot += bits.astype(object) << e
        return tot

    A = rand_planes(m_a)
    C = rand_planes(m_c)
    # make a stripe of columns exactly equal: write Σa's binary rep
    # into c addend 0 and zero the rest
    va = values(A)
    for col in range(0, W, 3):
        for e in range(P):
            w = np.uint32(0)
            for j in range(32):
                w |= np.uint32(((int(va[col, j]) >> e) & 1) << j)
            C[0, e, col] = w
        C[1:, :, col] = 0
    expected = values(A) != values(C)  # [W, 32]
    bad = np.asarray(
        kern(
            jnp.asarray(A.reshape(m_a * P, W)),
            jnp.asarray(C.reshape(m_c * P, W)),
        )
    )  # u32[W]
    got = ((bad[:, None] >> np.arange(32)) & 1) != 0
    assert (got == expected).all()
    assert not expected[::3].any() and expected.any()


def test_bitplane_kernel_mc2_branch():
    _check_mc2_kernel(m_a=3, m_c=2, n_pos=24, expected_P=32, max_bit=20)


def test_bitplane_kernel_mc2_branch_wide():
    """P > 32 with m_c > 1: the two's-complement correction plane must be
    built from STATIC bit selection — a runtime `m_c >> e_row` has
    implementation-defined results once the shift amount reaches 32
    (ADVICE r4). m_c = 3 sets two correction rows."""
    _check_mc2_kernel(m_a=4, m_c=3, n_pos=40, expected_P=64, max_bit=36)


def _adversarial_pow2_setup():
    """Template with a MultiEq-SHAPED row whose A-side coefficient total
    is exactly p: 2^254·x + (p − 2^254)·y ≡ 0 (mod p) holds at
    x = y = 1 while the INTEGER sum is p ≠ 0. If the classifier
    misrouted this row to the bit-sliced integer-equality check
    (matvec.py _classify_pow2_eq_rows' `total >= p` guard), the check
    would flag a field-satisfied witness as violated."""
    from bellpepper_tpu.constraint_system import ConstraintSystem

    from bellpepper_tpu.fields import SCALAR

    p = SCALAR.p
    hi = 1 << 254

    def circuit(cs):
        x = AllocatedBit.alloc(cs.namespace("x"), None)
        y = AllocatedBit.alloc(cs.namespace("y"), None)
        cs.enforce(
            "adv total=p",
            lambda lc: lc + (hi, x.variable) + (p - hi, y.variable),
            lambda lc: lc + ConstraintSystem.one(),
            lambda lc: lc,
        )
        # enough genuine gadget rows to keep the small/big partition on
        bits = [
            AllocatedBit.alloc(cs.namespace(f"b{i}"), None) for i in range(8)
        ]
        for i in range(4):
            AllocatedBit.xor(cs.namespace(f"x{i}"), bits[i], bits[i + 4])

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    return template, WitnessProgram(tape)


def test_pow2_classifier_rejects_side_total_ge_p():
    from bellpepper_tpu.backend.matvec import (
        _classify_pow2_eq_rows,
        _classify_small_rows,
    )

    template, prog = _adversarial_pow2_setup()
    ADV = 2  # after the x/y booleanity rows
    small_idx, big_idx, _lay = _classify_small_rows(template)
    assert ADV in big_idx, "the adversarial row must be a big row"
    spec, rest_pos = _classify_pow2_eq_rows(template, big_idx)
    # the >= p guard must refuse the row: it lands in rest_pos (the
    # fused field-exact path), never in the integer-equality spec
    assert spec is None or ADV not in spec["rows_orig"]
    assert ADV in [int(big_idx[r]) for r in rest_pos]

    # End-to-end: the packed mask must agree with the bits form AND with
    # ground-truth field semantics — instance (x=1, y=1) satisfies the
    # row mod p even though the integer sum is p.
    B = 512
    n_free = len(prog.free_slots)
    free = RNG.integers(0, 2, size=(B, n_free)).astype(np.uint32)
    free[0, :2] = (1, 1)  # lhs = p ≡ 0 (mod p): satisfied, ℤ-sum ≠ 0
    free[1, :2] = (0, 0)  # lhs = 0: satisfied
    free[2, :2] = (1, 0)  # lhs = 2^254: violated
    free[3, :2] = (0, 1)  # lhs = p − 2^254: violated
    vp = prog.build_packed()(pack_bits(jnp.asarray(free)))
    viol_p = jax.jit(build_templated_check(template, B, False, "bits_packed"))
    viol_u = jax.jit(build_templated_check(template, B, False, "bits"))
    m_p = np.asarray(viol_p(vp)).reshape(B, template.num_constraints)
    m_u = np.asarray(viol_u(jnp.asarray(unpack_bits(vp)))).reshape(
        B, template.num_constraints
    )
    assert (m_p == m_u).all()
    assert not m_p[0, ADV] and not m_p[1, ADV]
    assert m_p[2, ADV] and m_p[3, ADV]
    # host ground truth for the four corner instances
    for i in range(4):
        z = np.asarray(unpack_bits(vp))[i]
        ok, first = template.eval_host([1], [int(v) for v in z[1:]])
        assert ok == (not m_p[i].any())


def _lookalike_setup():
    """Family-LOOKALIKE rows with perturbed coefficients: an and-shaped
    row with a non-unit C coefficient (x·y = 2z) and an xor-shaped row
    with the result sign flipped (2x·y = x + y + z). Neither matches its
    family's exact-coefficient pattern (matvec.py
    _classify_bit_row_families), so both must fall to the generic
    leftover path and keep exact field semantics."""

    def circuit(cs):
        x = AllocatedBit.alloc(cs.namespace("x"), None)
        y = AllocatedBit.alloc(cs.namespace("y"), None)
        z = AllocatedBit.alloc(cs.namespace("z"), None)
        cs.enforce(
            "and-lookalike",
            lambda lc: lc + x.variable,
            lambda lc: lc + y.variable,
            lambda lc: lc + (2, z.variable),
        )
        cs.enforce(
            "xor-lookalike",
            lambda lc: lc + x.variable + x.variable,
            lambda lc: lc + y.variable,
            lambda lc: lc + x.variable + y.variable + z.variable,
        )
        # genuine rows so the family classifier has real matches too
        bits = [
            AllocatedBit.alloc(cs.namespace(f"b{i}"), None) for i in range(8)
        ]
        for i in range(4):
            AllocatedBit.xor(cs.namespace(f"g{i}"), bits[i], bits[i + 4])

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    return template, WitnessProgram(tape)


def test_family_lookalikes_fall_to_generic():
    from bellpepper_tpu.backend.matvec import (
        _classify_bit_row_families,
        _classify_small_rows,
    )

    template, prog = _lookalike_setup()
    small_idx, _big, _lay = _classify_small_rows(template)
    fams, leftover_pos = _classify_bit_row_families(template, small_idx)
    leftover_rows = set(int(r) for r in small_idx[leftover_pos])
    # rows 3 and 4 (after the three booleanity rows) are the lookalikes
    assert {3, 4} <= leftover_rows, f"lookalikes matched a family: {fams.keys()}"
    for kind, (_ops, rows) in fams.items():
        assert 3 not in rows and 4 not in rows

    # the generic path must kill mutations the family formulas would
    # miss: all-zeros satisfies both rows; z = 1 violates both.
    B = 512
    n_free = len(prog.free_slots)
    free = RNG.integers(0, 2, size=(B, n_free)).astype(np.uint32)
    free[0, :3] = (0, 0, 0)  # satisfies both lookalikes
    free[1, :3] = (0, 0, 1)  # violates both (0 = 2z; 0 = z)
    vp = prog.build_packed()(pack_bits(jnp.asarray(free)))
    viol_p = jax.jit(build_templated_check(template, B, False, "bits_packed"))
    viol_u = jax.jit(build_templated_check(template, B, False, "bits"))
    m_p = np.asarray(viol_p(vp)).reshape(B, template.num_constraints)
    m_u = np.asarray(viol_u(jnp.asarray(unpack_bits(vp)))).reshape(
        B, template.num_constraints
    )
    assert (m_p == m_u).all()
    assert not m_p[0, 3] and not m_p[0, 4]
    assert m_p[1, 3] and m_p[1, 4]


def test_packed_verdict_matches_mask():
    """The reduced (nb, first) verdict must agree with the full mask —
    including `first` as the min instance-major flat violation index —
    for small-row and big-row corruptions."""
    template, prog = _addmany_setup()
    B = 1024
    vp = _packed_z(prog, B)
    viol = build_templated_check(template, B, False, "bits_packed")
    verdict = jax.jit(viol.verdict)
    mask_fn = jax.jit(viol)
    m = np.asarray(mask_fn(vp))
    nb, _first = verdict(vp)
    assert int(nb) == m.sum() == 0
    for slot, word, bit in ((5, 2, 7), (prog.num_slots - 2, 0, 31), (1, 0, 0)):
        vpb = vp.at[word, slot].set(vp[word, slot] ^ np.uint32(1 << bit))
        m = np.asarray(mask_fn(vpb))
        nb, first = verdict(vpb)
        assert int(nb) == m.sum() > 0
        assert int(first) == int(np.argmax(m))


def test_packed_production_step():
    template, prog = _addmany_setup()
    B, n_chunks = 512, 2
    free = RNG.integers(
        0, 1 << 32, size=(n_chunks, B // 32, len(prog.free_slots)), dtype=np.uint64
    ).astype(np.uint32)
    step = build_packed_production_step(prog, template, B, use_pallas=False)
    total, _first = step(jnp.asarray(free))
    assert int(total) == 0


def test_bits_domain_contract_limbs_kills_nonbit():
    """Pointer test for the bits/bits_packed DOMAIN CONTRACT
    (build_templated_check docstring): a NON-bit field value planted in
    a bit slot — the reference's set-to-random mutation probe
    (num.rs:707-713) — is representable only on the limbs form, where
    the booleanity row must catch it; the packed representation cannot
    express it at all (a slot IS one bit per instance)."""
    from bellpepper_tpu.backend.matvec import build_templated_check
    from bellpepper_tpu.backend.field_jnp import get_backend

    template, prog = _addmany_setup()
    assert "DOMAIN CONTRACT" in build_templated_check.__doc__
    B = 8
    free = RNG.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vals, _fl = prog.run(free)
    be = get_backend(template.field)
    z3 = np.zeros((B, prog.num_slots, 16), np.uint32)
    z3[..., 0] = np.asarray(vals) & 0xFFFF
    viol = jax.jit(build_templated_check(template, B, False, "limbs"))
    assert np.asarray(viol(jnp.asarray(z3))).sum() == 0
    # plant a non-bit field value (5) into a booleanity-constrained slot
    bad = z3.copy()
    bad[2, 5] = 0
    bad[2, 5, 0] = 5
    m = np.asarray(viol(jnp.asarray(bad))).reshape(B, template.num_constraints)
    assert m[2].any(), "limbs form must kill the non-bit mutation"


def test_family_formulas_exhaustive_truth_tables():
    """Brute-force every family's packed bad-word formula against the
    actual field equation over ALL bit assignments — including
    inconsistent intermediate product slots (e.g. maj's bc), which a
    corrupted witness can produce."""
    from bellpepper_tpu.backend.matvec import _family_bad

    P = (1 << 255) - 19  # any odd prime >> operand bounds works here

    def fe(x):
        return x % P

    cases = {
        # kind: (n_vars, field_row_holds(vars))
        "condalloc": (2, lambda x, m: fe((1 - m - x) * x) == 0),
        "xor": (3, lambda x, y, z: fe(2 * x * y) == fe(x + y - z)),
        "and": (3, lambda x, y, z: fe(x * y) == fe(z)),
        "and_not": (3, lambda x, y, z: fe(x * (1 - y)) == fe(z)),
        "nor": (3, lambda x, y, z: fe((1 - x) * (1 - y)) == fe(z)),
        "ch": (4, lambda a, b, c, ch: fe((b - c) * a) == fe(ch - c)),
        "maj2": (
            5,
            lambda a, b, c, bc, maj: fe((2 * bc - b - c) * a)
            == fe(bc - maj),
        ),
    }
    for kind, (n, holds) in cases.items():
        for bits in range(1 << n):
            vals = [(bits >> i) & 1 for i in range(n)]
            X = [jnp.uint32(0xFFFFFFFF if v else 0) for v in vals]
            bad = int(np.asarray(_family_bad(kind, X))) != 0
            assert bad == (not holds(*vals)), (
                f"{kind} formula wrong at {vals}: bad={bad}, "
                f"equation holds={holds(*vals)}"
            )
