"""Device (TPU/XLA) backend: limb-decomposed field arithmetic, sparse
R1CS evaluation, and sharded satisfiability.

This is the half of the framework that replaces the reference's
`ff`/`blstrs` native field arithmetic and its sequential evaluation loops
(lc.rs:245-267, test_cs.rs:239-253) with data-parallel kernels:

  - limbs.py     — host ↔ device layout conversions
  - field_jnp.py — vectorized 𝔽_p arithmetic on limb planes (jnp; the
                   pure-XLA path that runs everywhere, incl. CPU tests)
  - field_pallas.py — Pallas TPU kernels for the hot ops
  - matvec.py    — sparse A/B/C row evaluation (gather + segment-sum)
  - sharding.py  — mesh/shard_map row-sharded satisfiability with psum
"""

from .field_jnp import FieldBackend, get_backend

__all__ = ["FieldBackend", "get_backend"]
