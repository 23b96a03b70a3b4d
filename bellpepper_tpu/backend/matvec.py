"""Sparse R1CS evaluation on device: gather → modmul → segment-sum →
reduce.

This replaces the reference's sequential `eval_lc` loops
(test_cs.rs:137-155, lc.rs:245-267) with a data-parallel pipeline over the
COO entries of each matrix:

    zv    = z[cols]                  # gather witness limbs     [E, 16]
    prod  = coeff[coeff_ids] ∘ zv    # batched modmul            [E, 16]
    digits= split8(prod)             # 8-bit planes              [E, 32]
    rowsum= segment_sum(digits, rows)# per-row accumulation      [R, 32]
    Az    = reduce(rowsum)           # wide→canonical            [R, 16]

The segment-sum accumulates 8-bit digits in 32-bit lanes, which is exact
for up to 2^24/255 ≈ 65k entries per row — far beyond any gadget-built
row (MultiEq packs at most CAPACITY bits ≈ a few hundred terms)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..r1cs import R1CS
from .field_jnp import FieldBackend, get_backend


class DeviceMatrix(NamedTuple):
    rows: jnp.ndarray  # int32[E]
    cols: jnp.ndarray  # int32[E]
    coeff_ids: jnp.ndarray  # int32[E]


class DeviceR1CS(NamedTuple):
    """R1CS resident on device: three COO matrices + the coefficient table
    as limb planes."""

    a: DeviceMatrix
    b: DeviceMatrix
    c: DeviceMatrix
    coeff_limbs: jnp.ndarray  # uint32[K, 16]
    num_constraints: int
    num_inputs: int
    num_aux: int

    @staticmethod
    def from_r1cs(r: R1CS) -> "DeviceR1CS":
        be = get_backend(r.field)
        return DeviceR1CS(
            a=DeviceMatrix(
                jnp.asarray(r.a.rows), jnp.asarray(r.a.cols), jnp.asarray(r.a.coeff_ids)
            ),
            b=DeviceMatrix(
                jnp.asarray(r.b.rows), jnp.asarray(r.b.cols), jnp.asarray(r.b.coeff_ids)
            ),
            c=DeviceMatrix(
                jnp.asarray(r.c.rows), jnp.asarray(r.c.cols), jnp.asarray(r.c.coeff_ids)
            ),
            coeff_limbs=jnp.asarray(be.to_limbs(r.coeff_table)),
            num_constraints=r.num_constraints,
            num_inputs=r.num_inputs,
            num_aux=r.num_aux,
        )


def sparse_matvec(
    be: FieldBackend,
    mat: DeviceMatrix,
    coeff_limbs: jnp.ndarray,
    z: jnp.ndarray,
    num_rows: int,
) -> jnp.ndarray:
    """M·z over 𝔽_p: returns uint32[num_rows, 16]."""
    zv = z[mat.cols]  # [E, 16]
    coeffs = coeff_limbs[mat.coeff_ids]  # [E, 16]
    prod = be.mul(zv, coeffs)  # [E, 16]
    digits = be._split8(prod)  # [E, 32], each < 256
    rowsum = jax.ops.segment_sum(digits, mat.rows, num_segments=num_rows)
    return be._reduce_wide8(rowsum)  # [R, 16]


def r1cs_eval(
    be: FieldBackend, d: DeviceR1CS, z: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(A·z, B·z, C·z), each uint32[R, 16]."""
    az = sparse_matvec(be, d.a, d.coeff_limbs, z, d.num_constraints)
    bz = sparse_matvec(be, d.b, d.coeff_limbs, z, d.num_constraints)
    cz = sparse_matvec(be, d.c, d.coeff_limbs, z, d.num_constraints)
    return az, bz, cz


def violation_mask(be: FieldBackend, d: DeviceR1CS, z: jnp.ndarray) -> jnp.ndarray:
    """bool[R]: True where A·z ∘ B·z ≠ C·z."""
    az, bz, cz = r1cs_eval(be, d, z)
    return ~be.eq(be.mul(az, bz), cz)


def assemble_z(be: FieldBackend, inputs, aux) -> jnp.ndarray:
    """Host witness → device z = inputs ++ aux as uint32[N, 16]."""
    return jnp.asarray(be.to_limbs(list(inputs) + list(aux)))


class Satisfier:
    """Compiled satisfiability checker for one R1CS.

    The jitted core returns (all_ok, first_bad_row); `which_is_unsatisfied`
    maps the row back to the constraint path on the host, mirroring
    TestConstraintSystem::which_is_unsatisfied (test_cs.rs:239-253)."""

    def __init__(self, r1cs: R1CS):
        self.r1cs = r1cs
        self.backend = get_backend(r1cs.field)
        self.device = DeviceR1CS.from_r1cs(r1cs)

        be = self.backend
        d = self.device

        @jax.jit
        def check(z):
            bad = violation_mask(be, d, z)
            any_bad = jnp.any(bad)
            first = jnp.argmax(bad)  # 0 when none; disambiguated by any_bad
            return any_bad, first

        self._check = check

    def z_from_assignments(self, inputs, aux) -> jnp.ndarray:
        return assemble_z(self.backend, inputs, aux)

    def is_satisfied(self, z: jnp.ndarray) -> bool:
        any_bad, _ = self._check(z)
        return not bool(any_bad)

    def which_is_unsatisfied(self, z: jnp.ndarray) -> Optional[str]:
        any_bad, first = self._check(z)
        if not bool(any_bad):
            return None
        row = int(first)
        if self.r1cs.names is not None:
            return self.r1cs.names[row]
        return f"constraint #{row}"
