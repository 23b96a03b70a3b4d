"""End-to-end device slice (SURVEY §7 stage 4): synthesize → compile →
witness → device satisfiability, checked bit-exactly against the
TestConstraintSystem host oracle — including which-constraint-failed
agreement under mutation."""

import random

import pytest

from bellpepper_tpu import SCALAR, TestConstraintSystem, WitnessCS
from bellpepper_tpu.backend.matvec import Satisfier
from bellpepper_tpu.gadgets.boolean import AllocatedBit, Boolean
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.r1cs import R1CS, ShapeCS

RNG = random.Random(0x5962BE3D)
P = SCALAR.p


def mul_add_circuit(cs, values=None):
    """BASELINE.json config 1: AllocatedNum mul/add chain."""
    vals = values or {}

    def v(name, default):
        return vals.get(name, default)

    a = AllocatedNum.alloc(cs.namespace("a"), v("a", 3))
    b = AllocatedNum.alloc(cs.namespace("b"), v("b", 4))
    c = a.mul(cs.namespace("ab"), b)
    d = c.add(cs.namespace("ab plus a"), a)
    e = d.square(cs.namespace("sq"))
    e.inputize(cs.namespace("out"))
    return e


def test_device_matches_host_oracle():
    cs = TestConstraintSystem()
    mul_add_circuit(cs)
    assert cs.is_satisfied()

    r1cs = R1CS.from_test_cs(cs)
    sat = Satisfier(r1cs)
    z = sat.z_from_assignments(cs.scalar_inputs(), cs.scalar_aux())
    assert sat.is_satisfied(z)
    assert sat.which_is_unsatisfied(z) is None


def test_device_detects_corruption_same_constraint():
    cs = TestConstraintSystem()
    mul_add_circuit(cs)
    cs.set("ab/product num", 999)  # corrupt

    # Host oracle
    host_failed = cs.which_is_unsatisfied()
    assert host_failed is not None

    r1cs = R1CS.from_test_cs(cs)
    sat = Satisfier(r1cs)
    z = sat.z_from_assignments(cs.scalar_inputs(), cs.scalar_aux())
    assert not sat.is_satisfied(z)
    assert sat.which_is_unsatisfied(z) == host_failed


def test_device_random_circuits():
    """Random mul/add/square DAGs: device verdict must equal host."""
    for trial in range(5):
        cs = TestConstraintSystem()
        nums = [
            AllocatedNum.alloc(cs.namespace(f"in {i}"), RNG.randrange(P))
            for i in range(4)
        ]
        for step in range(12):
            op = RNG.randrange(3)
            x = RNG.choice(nums)
            y = RNG.choice(nums)
            ns = cs.namespace(f"op {step}")
            if op == 0:
                nums.append(x.mul(ns, y))
            elif op == 1:
                nums.append(x.add(ns, y))
            else:
                nums.append(x.square(ns))
        assert cs.is_satisfied()

        r1cs = R1CS.from_test_cs(cs)
        sat = Satisfier(r1cs)
        z = sat.z_from_assignments(cs.scalar_inputs(), cs.scalar_aux())
        assert sat.is_satisfied(z)

        # corrupt a random aux var
        aux = cs.scalar_aux()
        idx = RNG.randrange(len(aux))
        aux[idx] = (aux[idx] + 1) % P
        z_bad = sat.z_from_assignments(cs.scalar_inputs(), aux)
        host_ok, host_row = r1cs.eval_host(cs.scalar_inputs(), aux)
        dev_failed = sat.which_is_unsatisfied(z_bad)
        if host_ok:
            assert dev_failed is None
        else:
            assert dev_failed == r1cs.names[host_row]


def test_shape_cs_matches_test_cs_structure():
    """ShapeCS (nameless fast compile) must produce the same matrices as
    compiling from TestConstraintSystem."""
    cs = TestConstraintSystem()
    mul_add_circuit(cs)
    r_named = R1CS.from_test_cs(cs)

    shape = ShapeCS()
    mul_add_circuit(shape)
    r_fast = shape.finish()

    assert r_fast.num_inputs == r_named.num_inputs
    assert r_fast.num_aux == r_named.num_aux
    assert r_fast.num_constraints == r_named.num_constraints
    for m in ("a", "b", "c"):
        mine = getattr(r_fast, m)
        theirs = getattr(r_named, m)
        assert (mine.rows == theirs.rows).all()
        assert (mine.cols == theirs.cols).all()
        got = [r_fast.coeff_table[i] for i in mine.coeff_ids]
        want = [r_named.coeff_table[i] for i in theirs.coeff_ids]
        assert got == want


def test_witness_cs_feeds_device():
    """Production flow: ShapeCS compile once + WitnessCS per instance."""
    shape = ShapeCS()
    mul_add_circuit(shape)
    r1cs = shape.finish()
    sat = Satisfier(r1cs)

    for a_val in (3, 17, P - 2):
        w = WitnessCS()
        mul_add_circuit(w, {"a": a_val})
        z = sat.z_from_assignments(w.inputs_slice(), w.aux_slice())
        assert sat.is_satisfied(z)


def test_r1cs_extend_matches_merged_synthesis():
    shape1 = ShapeCS()
    mul_add_circuit(shape1)
    r1 = shape1.finish()
    shape2 = ShapeCS()
    mul_add_circuit(shape2)
    r2 = shape2.finish()
    merged = r1.extend(r2)

    both = ShapeCS()
    mul_add_circuit(both)
    mul_add_circuit(both)
    r_both = both.finish()

    assert merged.num_inputs == r_both.num_inputs
    assert merged.num_aux == r_both.num_aux
    assert merged.num_constraints == r_both.num_constraints

    # Witness for the merged system must satisfy on device.
    w = WitnessCS()
    mul_add_circuit(w)
    mul_add_circuit(w)
    sat = Satisfier(merged)
    z = sat.z_from_assignments(w.inputs_slice(), w.aux_slice())
    assert sat.is_satisfied(z)


def test_r1cs_replicate():
    """replicate(n) == n-fold extend for an input-free template."""

    def template(cs):
        a = AllocatedNum.alloc(cs.namespace("a"), 5)
        b = AllocatedNum.alloc(cs.namespace("b"), 6)
        a.mul(cs.namespace("prod"), b)

    shape = ShapeCS()
    template(shape)
    r = shape.finish()
    r4 = r.replicate(4)
    assert r4.num_constraints == 4 * r.num_constraints
    assert r4.num_aux == 4 * r.num_aux

    w = WitnessCS()
    for _ in range(4):
        template(w)
    sat = Satisfier(r4)
    z = sat.z_from_assignments(w.inputs_slice(), w.aux_slice())
    assert sat.is_satisfied(z)

    aux = list(w.aux_slice())
    aux[7] = (aux[7] + 1) % P
    assert not sat.is_satisfied(sat.z_from_assignments(w.inputs_slice(), aux))
