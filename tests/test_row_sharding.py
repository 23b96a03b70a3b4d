"""Constraint-axis (row) sharding of one monolithic R1CS over the virtual
mesh: verdicts and failure localization must match the host oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from bellpepper_tpu import SCALAR, TestConstraintSystem
from bellpepper_tpu.backend.sharding import RowShardedSatisfier, default_mesh
from bellpepper_tpu.gadgets.num import AllocatedNum
from bellpepper_tpu.r1cs import R1CS

RNG = random.Random(0x5962BE3D)
P_MOD = SCALAR.p


def build_circuit(cs, n=50):
    nums = [
        AllocatedNum.alloc(cs.namespace(f"in {i}"), RNG.randrange(P_MOD))
        for i in range(4)
    ]
    for step in range(n):
        x = RNG.choice(nums)
        y = RNG.choice(nums)
        ns = cs.namespace(f"op {step}")
        op = RNG.randrange(3)
        if op == 0:
            nums.append(x.mul(ns, y))
        elif op == 1:
            nums.append(x.add(ns, y))
        else:
            nums.append(x.square(ns))


def test_row_sharded_matches_oracle():
    cs = TestConstraintSystem()
    build_circuit(cs)
    assert cs.is_satisfied()
    r1cs = R1CS.from_test_cs(cs)

    mesh = default_mesh()  # 8 virtual CPU devices
    sat = RowShardedSatisfier(r1cs, mesh, use_pallas=False)
    z = sat.z_from_assignments(cs.scalar_inputs(), cs.scalar_aux())
    assert sat.is_satisfied(z)
    assert sat.which_is_unsatisfied(z) is None

    # Corrupt one aux value; failure must match the host oracle's FIRST
    # failing constraint (lowest row index).
    aux = cs.scalar_aux()
    idx = RNG.randrange(len(aux))
    aux[idx] = (aux[idx] + 1) % P_MOD
    host_ok, host_row = r1cs.eval_host(cs.scalar_inputs(), aux)
    zb = sat.z_from_assignments(cs.scalar_inputs(), aux)
    got = sat.which_is_unsatisfied(zb)
    if host_ok:
        assert got is None
    else:
        assert got == r1cs.names[host_row]


def test_row_sharded_mesh_sizes():
    cs = TestConstraintSystem()
    build_circuit(cs, n=20)
    r1cs = R1CS.from_test_cs(cs)
    z = None
    for n_dev in (1, 2, 4, 8):
        sat = RowShardedSatisfier(r1cs, default_mesh(n_dev), use_pallas=False)
        if z is None:
            z = sat.z_from_assignments(cs.scalar_inputs(), cs.scalar_aux())
        assert sat.is_satisfied(z)
