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
