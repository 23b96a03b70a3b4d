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


def test_bitplane_kernel_mc2_branch():
    """m_c > 1 takes the two's-complement (mod 2^P) kernel form, which
    no gadget circuit here produces — verify it against exact integer
    arithmetic on synthetic planes, for equal and unequal sides."""
    from bellpepper_tpu.backend.field_pallas import make_bitplane_eq_kernel

    m_a, m_c, n_pos = 3, 2, 24
    kern = make_bitplane_eq_kernel(n_pos, m_a, m_c, interpret=True)
    P = kern.n_pos_padded
    assert P == 32
    W = 512

    # random addend planes with bits only below 20 so every side's
    # value < (m+1)·2^20 < 2^P (the classifier's soundness condition)
    def rand_planes(m):
        pl_ = np.zeros((m, P, W), np.uint32)
        pl_[:, :20] = (
            RNG.integers(0, 1 << 32, size=(m, 20, W), dtype=np.uint64)
            .astype(np.uint32)
        )
        return pl_

    def values(pl_):
        """exact per-(column, bit-lane) integer value of Σ_k Σ_e 2^e·bit"""
        tot = np.zeros((W, 32), np.uint64)
        for k in range(pl_.shape[0]):
            for e in range(P):
                bits = (pl_[k, e][:, None] >> np.arange(32)) & 1
                tot += bits.astype(np.uint64) << np.uint64(e)
        return tot

    A = rand_planes(m_a)
    C = rand_planes(m_c)
    # make a stripe of columns exactly equal: write Σa's binary rep
    # into c addend 0 and zero addend 1
    va = values(A)
    for col in range(0, W, 3):
        for e in range(P):
            w = np.uint32(0)
            for j in range(32):
                w |= np.uint32(((int(va[col, j]) >> e) & 1) << j)
            C[0, e, col] = w
        C[1, :, col] = 0
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
