"""bellpepper_tpu — a TPU-native R1CS constraint-synthesis and
witness-generation framework.

A ground-up re-design of argumentcomputer/bellpepper (Rust) for TPU:

  * Host layer (this package's core): ConstraintSystem / LinearCombination /
    gadget synthesis, API-compatible in spirit with the reference's two
    crates (bellpepper-core + bellpepper), bit-exact in its oracles
    (constraint counts, shape hashes, digests).
  * Device layer (`bellpepper_tpu.backend`): prime-field arithmetic on
    limb-decomposed JAX arrays, satisfiability as sharded sparse matvecs,
    and vectorized witness programs, targeting TPUs via XLA + Pallas and
    scaling over `jax.sharding.Mesh` with psum collectives.

Public surface mirrors reference crates/bellpepper-core/src/lib.rs:18-27 and
crates/bellpepper/src/{lib,gadgets/mod,util_cs/mod}.rs."""

from .constraint_system import (
    BELLPEPPER_TPU_VERSION,
    Circuit,
    ConstraintSystem,
    Namespace,
    SynthesisError,
)
from .fields import FIELDS, PALLAS_SCALAR, SCALAR, VESTA_SCALAR, PrimeField
from .lc import Index, LinearCombination, Variable
from .util_cs import (
    BenchCS,
    Comparable,
    Constraint,
    Delta,
    MetricCS,
    SizedWitness,
    TestConstraintSystem,
    WitnessCS,
)

__version__ = BELLPEPPER_TPU_VERSION

__all__ = [
    "BELLPEPPER_TPU_VERSION",
    "Circuit",
    "ConstraintSystem",
    "Namespace",
    "SynthesisError",
    "PrimeField",
    "SCALAR",
    "PALLAS_SCALAR",
    "VESTA_SCALAR",
    "FIELDS",
    "Index",
    "LinearCombination",
    "Variable",
    "Comparable",
    "Constraint",
    "Delta",
    "TestConstraintSystem",
    "MetricCS",
    "BenchCS",
    "WitnessCS",
    "SizedWitness",
]
