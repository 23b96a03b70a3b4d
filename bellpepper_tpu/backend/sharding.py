"""Multi-chip scaling: mesh-sharded witness generation + satisfiability.

The reference's only multi-executor seam is `extend` — synthesize disjoint
sub-circuits independently, merge in order (constraint_system.rs:138-148).
The TPU-native equivalent shards the *instance batch* of a templated R1CS
over a `jax.sharding.Mesh`:

  * witness generation: each chip runs the compiled witness program on its
    shard of free inputs (embarrassingly parallel);
  * satisfiability: each chip evaluates its shard's constraint rows; the
    global verdict is a `psum` of violation counts over ICI (the
    "distributed communication backend" slot from SURVEY §2.4);
  * the merge order is deterministic (instance index), so sharded results
    bit-equal sequential synthesis — the extend associativity property.

Constraint-axis sharding for a single huge non-templated circuit follows
the same pattern with row-sharded ELL matrices; templated batching is the
primary production shape (Nova-style folding workloads are batches of
identical step circuits)."""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..r1cs import R1CS
from .matvec import build_templated_check


def default_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class ShardedSatisfier:
    """Templated satisfiability over a device mesh.

    The instance batch B is sharded over the mesh's axis; each device
    checks its local instances with the same compiled pipeline; the
    verdict aggregates with psum. `which` information comes back as the
    global minimum violating flat row (instances are the leading axis, so
    min over the sharded axis composes with psum-min)."""

    def __init__(
        self,
        template: R1CS,
        batch: int,
        mesh: Mesh,
        use_pallas: bool | None = None,
        axis: str = "data",
        witness_form: str = "limbs",
    ):
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        n_dev = mesh.devices.size
        assert batch % n_dev == 0, "batch must divide evenly over the mesh"
        self.r1cs = template
        self.batch = batch
        self.mesh = mesh
        self.axis = axis
        Rt = template.num_constraints
        local_b = batch // n_dev
        violations = build_templated_check(
            template, local_b, use_pallas, witness_form
        )
        self.num_constraints_total = batch * Rt

        from jax import shard_map

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis),),
            out_specs=(P(), P()),
        )
        def check_local(z3_local):
            bad = violations(z3_local)  # bool[local_b·Rt]
            n_bad = jnp.sum(bad.astype(jnp.uint32))
            # Global flat index of the first violation on this shard,
            # offset by the shard's instance base.
            shard = jax.lax.axis_index(axis)
            base = shard.astype(jnp.uint32) * jnp.uint32(local_b * Rt)
            local_first = jnp.argmax(bad).astype(jnp.uint32) + base
            sentinel = jnp.uint32(0xFFFFFFFF)
            local_first = jnp.where(n_bad > 0, local_first, sentinel)
            total_bad = jax.lax.psum(n_bad, axis)
            global_first = jax.lax.pmin(local_first, axis)
            return total_bad[None], global_first[None]

        @jax.jit
        def check(z3):
            total_bad, first = check_local(z3)
            return total_bad[0], first[0]

        self._check = check
        self.z_sharding = NamedSharding(mesh, P(axis))

    def shard_z(self, z3) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(z3, jnp.uint32), self.z_sharding)

    def is_satisfied(self, z3) -> bool:
        total_bad, _ = self._check(z3)
        return int(total_bad) == 0

    def which_is_unsatisfied(self, z3) -> Optional[str]:
        total_bad, first = self._check(z3)
        if int(total_bad) == 0:
            return None
        flat = int(first)
        inst, row = divmod(flat, self.r1cs.num_constraints)
        name = (
            self.r1cs.names[row]
            if self.r1cs.names is not None
            else f"constraint #{row}"
        )
        return f"instance {inst}: {name}"


def sharded_witness_and_check(
    prog,
    template: R1CS,
    batch: int,
    mesh: Mesh,
    use_pallas: bool | None = None,
    axis: str = "data",
):
    """Build the full sharded production step: free inputs → device witness
    generation → satisfiability, all under one jit over the mesh.

    Returns (step_fn, in_sharding) where step_fn(free_bits[B, n_free]) →
    (total_violations, z3_sharded). Witness generation is per-instance
    independent, so sharding the batch axis is enough; the check reduces
    with psum."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    n_dev = mesh.devices.size
    assert batch % n_dev == 0
    local_b = batch // n_dev
    pure_bits = prog.is_pure_bits
    violations = build_templated_check(
        template, local_b, use_pallas, "bits" if pure_bits else "limbs"
    )
    evaluator = prog.build()

    from jax import shard_map

    n_free_field = max(len(prog.free_field_slots), 1)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P(axis)),
    )
    def step_local(free_bits_local, free_field_local):
        vals, flimbs = evaluator(free_bits_local, free_field_local)
        if pure_bits:
            z = vals  # bits fast path: no limb materialization
        else:
            z = prog.z_template_limbs(vals, flimbs, free_field_local)
        bad = violations(z)
        n_bad = jax.lax.psum(jnp.sum(bad.astype(jnp.uint32)), axis)
        return n_bad[None], z

    @jax.jit
    def step(free_bits, free_field=None):
        if free_field is None:
            free_field = jnp.zeros((free_bits.shape[0], n_free_field, 16), jnp.uint32)
        n_bad, z3 = step_local(free_bits, free_field)
        return n_bad[0], z3

    return step, NamedSharding(mesh, P(axis))
