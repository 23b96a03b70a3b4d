"""Real-TPU tests (run with BP_TPU_TESTS=1; skipped on the CPU mesh):
fused Pallas matvec parity against the host bigint oracle, and the
generic Satisfier's Pallas path."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu",), reason="requires a TPU backend"
)


def test_fused_bits_matvec_matches_host_oracle():
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import build_templated_check
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.native import NativeBuilder

    nb = NativeBuilder()
    bits = [nb.alloc_bit() for _ in range(64)]
    nb.multieq_begin()
    nb.addmany([bits[:32], bits[32:]])
    nb.multieq_end()
    x = nb.xor(bits[0], bits[1])
    nb.maj(x, bits[2], nb.not_(bits[3]))
    template, tape = nb.finish()
    prog = WitnessProgram(tape)

    B = 128
    rng = np.random.default_rng(3)
    free = rng.integers(0, 2, size=(B, len(prog.free_slots))).astype(np.uint32)
    vals, _ = prog.run(jnp.asarray(free))

    viol = jax.jit(build_templated_check(template, B, True, "bits"))
    assert int(jnp.sum(viol(vals).astype(jnp.uint32))) == 0

    vbad = vals.at[5, 40].set(vals[5, 40] ^ 1)
    bad = np.asarray(viol(vbad)).reshape(B, template.num_constraints)
    # host oracle for the corrupted instance
    aux = [int(v) for v in np.asarray(vbad)[5][1:]]
    p = template.field.p
    z = [1] + aux
    sums = {m: [0] * template.num_constraints for m in "abc"}
    for m in "abc":
        mat = getattr(template, m)
        s = sums[m]
        ct = template.coeff_table
        for r, c, ci in zip(mat.rows, mat.cols, mat.coeff_ids):
            s[r] = (s[r] + ct[ci] * z[c]) % p
    host_bad = [
        r
        for r in range(template.num_constraints)
        if (sums["a"][r] * sums["b"][r] - sums["c"][r]) % p
    ]
    assert list(np.nonzero(bad[5])[0]) == host_bad
    assert bad[np.arange(B) != 5].sum() == 0


def test_generic_satisfier_pallas_path():
    from bellpepper_tpu import TestConstraintSystem
    from bellpepper_tpu.backend.matvec import Satisfier
    from bellpepper_tpu.gadgets.num import AllocatedNum
    from bellpepper_tpu.r1cs import R1CS

    cs = TestConstraintSystem()
    a = AllocatedNum.alloc(cs.namespace("a"), 7)
    b = a.square(cs.namespace("b"))
    b.mul(cs.namespace("c"), a)
    sat = Satisfier(R1CS.from_test_cs(cs), use_pallas=True)
    z = sat.z_from_assignments(cs.scalar_inputs(), cs.scalar_aux())
    assert sat.is_satisfied(z)
    aux = cs.scalar_aux()
    aux[0] = (aux[0] + 1) % cs.field.p
    zb = sat.z_from_assignments(cs.scalar_inputs(), aux)
    assert sat.which_is_unsatisfied(zb) == "b/squaring constraint"


def test_fused_limbs_matvec_matches_host_oracle():
    """Field-valued templated check on the fused (fold-matrix MXU) path:
    satisfied batch passes, a corrupted instance fails exactly the rows
    the host bigint oracle says, other instances stay clean."""
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import TemplatedSatisfier
    from bellpepper_tpu.r1cs import ShapeCS
    from bellpepper_tpu.gadgets.num import AllocatedNum

    # A field-valued template: mul/add/square chain (config-1 shaped).
    shape = ShapeCS()
    a = AllocatedNum.alloc(shape.namespace("a"), None)
    b = AllocatedNum.alloc(shape.namespace("b"), None)
    x = a
    for i in range(4):
        x = x.mul(shape.namespace(f"m{i}"), b)
        x = x.add(shape.namespace(f"s{i}"), a)
        x = x.square(shape.namespace(f"q{i}"))
    template = shape.finish()
    S = template.num_inputs + template.num_aux
    p = template.field.p

    B = 128
    rng = np.random.default_rng(11)
    # Build satisfying witnesses on the host with python ints.
    zs = []
    for _ in range(B):
        av = int.from_bytes(rng.bytes(31), "little") % p
        bv = int.from_bytes(rng.bytes(31), "little") % p
        vals = [1, av, bv]
        x = av
        for _i in range(4):
            x = (x * bv) % p
            vals.append(x)
            x = (x + av) % p
            vals.append(x)
            x = (x * x) % p
            vals.append(x)
        assert len(vals) == S
        zs.append(vals)

    from bellpepper_tpu.backend.field_jnp import get_backend

    be = get_backend(template.field)
    z3 = np.stack([be.to_limbs(v) for v in zs])  # [B, S, 16]

    sat = TemplatedSatisfier(template, B, use_pallas=True, witness_form="limbs")
    # The fused path must actually be selected on TPU.
    assert sat._check is not None
    d = jnp.asarray(z3)
    assert sat.is_satisfied(d)

    # Corrupt one instance's mid-chain value.
    zbad = list(zs[17])
    zbad[5] = (zbad[5] + 1) % p
    z3b = z3.copy()
    z3b[17] = be.to_limbs(zbad)
    which = sat.which_is_unsatisfied(jnp.asarray(z3b))
    assert which is not None and which.startswith("instance 17:"), which

    # Host oracle: exact rows that fail for the corrupted instance.
    sums = {m: [0] * template.num_constraints for m in "abc"}
    for m in "abc":
        mat = getattr(template, m)
        ct = template.coeff_table
        for r, c, ci in zip(mat.rows, mat.cols, mat.coeff_ids):
            sums[m][r] = (sums[m][r] + ct[ci] * zbad[c]) % p
    host_bad = [
        r
        for r in range(template.num_constraints)
        if (sums["a"][r] * sums["b"][r] - sums["c"][r]) % p
    ]
    from bellpepper_tpu.backend.matvec import build_templated_check

    viol = jax.jit(build_templated_check(template, B, True, "limbs"))
    bad = np.asarray(viol(jnp.asarray(z3b))).reshape(B, template.num_constraints)
    assert list(np.nonzero(bad[17])[0]) == host_bad
    assert bad[np.arange(B) != 17].sum() == 0


def test_mixed_form_pallas_matches_cpu_lowering():
    """The MIXED witness form's Pallas path (fused mul-compare for
    product rows) must agree with the use_pallas=False lowering on the
    real chip — valid witness and corruptions."""
    import jax.numpy as jnp

    from bellpepper_tpu.backend.matvec import build_templated_check
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
    from bellpepper_tpu.gadgets.multipack import pack_bits as gpack
    from bellpepper_tpu.r1cs import ShapeCS

    def circuit(cs):
        bs = [
            Boolean.from_bit(AllocatedBit.alloc(cs.namespace(f"b{i}"), None))
            for i in range(32)
        ]
        a = gpack(cs.namespace("pa"), bs[:16])
        b = gpack(cs.namespace("pb"), bs[16:])
        x = a
        for i in range(4):
            x = x.mul(cs.namespace(f"m{i}"), b)
            x = x.add(cs.namespace(f"a{i}"), a)
            x = x.square(cs.namespace(f"s{i}"))

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)
    fs = sorted(prog.field_rows, key=prog.field_rows.get)

    B = 1024
    rng = np.random.default_rng(17)
    free = rng.integers(0, 2, size=(B, 32)).astype(np.uint32)
    vals, flimbs = prog.run(jnp.asarray(free))

    viol_t = jax.jit(
        build_templated_check(template, B, True, "mixed", field_slots=fs)
    )
    viol_c = jax.jit(
        build_templated_check(template, B, False, "mixed", field_slots=fs)
    )
    m_t = np.asarray(viol_t(vals, flimbs))
    m_c = np.asarray(viol_c(vals, flimbs))
    assert m_t.sum() == 0 and (m_t == m_c).all()
    for b, s, limb in ((3, 34, 0), (77, 1, 0), (500, 40, 7)):
        if s in fs:
            fl_bad = flimbs.at[b, fs.index(s), limb].set(
                flimbs[b, fs.index(s), limb] ^ np.uint32(0x31)
            )
            m_t = np.asarray(viol_t(vals, fl_bad))
            m_c = np.asarray(viol_c(vals, fl_bad))
        else:
            v_bad = vals.at[b, s].set(vals[b, s] ^ np.uint32(1))
            m_t = np.asarray(viol_t(v_bad, flimbs))
            m_c = np.asarray(viol_c(v_bad, flimbs))
        assert m_t.sum() > 0 and (m_t == m_c).all()


def test_kernel_v2_tails_on_chip():
    """v2 canonicalization (quotient estimate) and the Montgomery
    zero-test, compiled for the real chip: modmul kernel vs the host
    bigint oracle on corner operands; mulcmp on exact multiples."""
    import jax.numpy as jnp

    from bellpepper_tpu.backend.field_pallas import (
        SEMI,
        get_pallas_ops,
        make_mulcmp,
    )
    from bellpepper_tpu.fields import SCALAR

    p = SCALAR.p
    ops_list = [0, 1, 2, p - 1, p - 2, (p - 1) // 2, p >> 128, 12345]
    pairs = [(a, b) for a in ops_list for b in ops_list]
    n = 1024
    pairs = (pairs * (n // len(pairs) + 1))[:n]
    a_lm = np.zeros((16, n), np.uint32)
    b_lm = np.zeros((16, n), np.uint32)
    for j, (a, b) in enumerate(pairs):
        for i in range(16):
            a_lm[i, j] = (a >> (16 * i)) & 0xFFFF
            b_lm[i, j] = (b >> (16 * i)) & 0xFFFF
    ops = get_pallas_ops(SCALAR)
    out = np.asarray(ops.mul(jnp.asarray(a_lm), jnp.asarray(b_lm)))
    for j, (a, b) in enumerate(pairs):
        got = sum(int(out[i, j]) << (16 * i) for i in range(16))
        assert got == a * b % p, f"pair {j}: ({a}, {b})"

    mc = make_mulcmp(SCALAR)
    c_lm = np.zeros((SEMI, n), np.uint32)
    for j, (a, b) in enumerate(pairs):
        c = a * b % p
        if j % 3 == 0 and c != (c ^ 1):
            c ^= 1  # corrupt every 3rd product
        for i in range(SEMI):
            c_lm[i, j] = (c >> (16 * i)) & 0xFFFF
    a17 = np.concatenate([a_lm, np.zeros((1, n), np.uint32)])
    b17 = np.concatenate([b_lm, np.zeros((1, n), np.uint32)])
    bad = np.asarray(mc(jnp.asarray(a17), jnp.asarray(b17), jnp.asarray(c_lm)))
    for j, (a, b) in enumerate(pairs):
        c_val = sum(int(c_lm[i, j]) << (16 * i) for i in range(SEMI))
        expect_bad = (a * b % p) != (c_val % p)
        assert (bad[j] != 0) == expect_bad, f"pair {j}"
