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
        batch: int | None = None,
        mesh: Mesh | None = None,
        use_pallas: bool | None = None,
        axis: str | None = None,
        witness_form: str | None = None,
        config=None,
    ):
        if config is not None:
            batch = config.batch if batch is None else batch
            mesh = config.make_mesh() if mesh is None else mesh
            use_pallas = config.use_pallas if use_pallas is None else use_pallas
            axis = config.mesh_axis if axis is None else axis
            witness_form = (
                config.witness_form if witness_form is None else witness_form
            )
        assert batch is not None and mesh is not None
        axis = axis or "data"
        witness_form = witness_form or "limbs"
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
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
            check_vma=False,  # pallas_call outputs carry no vma info
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
        use_pallas = jax.default_backend() == "tpu"
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
        check_vma=False,  # pallas_call outputs carry no vma info
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


def sharded_packed_witness_and_check(
    prog,
    template: R1CS,
    batch: int,
    mesh: Mesh,
    use_pallas: bool | None = None,
    axis: str = "data",
):
    """The BIT-SLICED production step over a device mesh: packed free
    bits → packed witness generation (WitnessProgram.build_packed, 32
    instances per uint32 word) → bits_packed reduced verdict, with the
    violation count psum-reduced and the first violating flat index
    pmin-reduced over ICI. This is the multi-device program of the
    flagship headline path (the same seam as sharded_witness_and_check —
    constraint_system.rs:134-148 — at 1/32nd the witness HBM traffic).

    The instance batch shards along the packed-word axis: free_packed is
    uint32[batch/32, n_free] (pack_bits layout: bit j of word w =
    instance 32·w + j), so each device holds a contiguous instance
    range and the merge order is deterministic — sharded == sequential
    (extend associativity).

    Returns (step_fn, in_sharding): step_fn(free_packed) →
    (total_violations, first_flat, vals_packed) where first_flat is the
    GLOBAL instance-major flat index (instance·Rt + row; sentinel
    0xFFFFFFFF when satisfied) and vals_packed is the sharded
    [batch/32, S_t] packed witness."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n_dev = mesh.devices.size
    local_b = batch // n_dev
    assert batch % n_dev == 0 and local_b % 512 == 0, (
        "packed sharding needs batch divisible by n_dev with >= 512 "
        "instances (16 packed words) per device"
    )
    Rt = template.num_constraints
    # Field-bearing bit templates (multipack outputs) take the MIXED
    # packed layout: bit words + an unpacked field-limb sidecar.
    mixed = not prog.is_packable and prog.is_packable_mixed
    field_slots = (
        sorted(prog.field_rows, key=prog.field_rows.get) if mixed else None
    )
    violations = build_templated_check(
        template, local_b, use_pallas, "bits_packed",
        field_slots=field_slots,
    )
    verdict = getattr(violations, "verdict", None)
    evaluator = prog.build_packed_mixed() if mixed else prog.build_packed()
    sentinel = jnp.uint32(0xFFFFFFFF)

    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    def step_local(free_packed_local):
        if mixed:
            vals_p, flimbs = evaluator(free_packed_local)
            args = (vals_p, flimbs)
        else:
            vals_p = evaluator(free_packed_local)  # [local_b/32, S_t]
            args = (vals_p,)
        if verdict is not None:
            nb, first = verdict(*args)
        else:
            bad = violations(*args)
            nb = jnp.sum(bad.astype(jnp.uint32))
            first = jnp.where(
                nb > 0, jnp.argmax(bad).astype(jnp.uint32), sentinel
            )
        shard = jax.lax.axis_index(axis).astype(jnp.uint32)
        first = jnp.where(
            nb > 0, first + shard * jnp.uint32(local_b * Rt), sentinel
        )
        total = jax.lax.psum(nb, axis)
        gfirst = jax.lax.pmin(first, axis)
        return total[None], gfirst[None], vals_p

    @jax.jit
    def step(free_packed):
        nb, first, vals = step_local(free_packed)
        return nb[0], first[0], vals

    return step, NamedSharding(mesh, P(axis))


class RowShardedSatisfier:
    """Constraint-axis sharding for ONE huge (non-templated) R1CS —
    BASELINE config 5. Rows are partitioned into contiguous ranges, one
    per device, with a shared ELL bucket signature so a single SPMD
    program (shard_map) evaluates every shard; z is replicated; the
    verdict reduces with psum over ICI.

    witness_form "bits" (all witness values 0/1) masks coefficient
    digits directly; "limbs" runs the full modmul per entry."""

    def __init__(
        self,
        r1cs: R1CS,
        mesh: Mesh | None = None,
        use_pallas: bool | None = None,
        axis: str | None = None,
        witness_form: str | None = None,
        config=None,
    ):
        if config is not None:
            mesh = config.make_mesh() if mesh is None else mesh
            use_pallas = config.use_pallas if use_pallas is None else use_pallas
            axis = config.mesh_axis if axis is None else axis
            witness_form = (
                config.witness_form if witness_form is None else witness_form
            )
        assert mesh is not None
        axis = axis or "data"
        witness_form = witness_form or "limbs"
        from .matvec import _JnpAdapter, _PallasAdapter, build_row_sharded_parts
        from ..backend.field_jnp import get_backend

        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        n_dev = mesh.devices.size
        self.r1cs = r1cs
        self.mesh = mesh
        be = get_backend(r1cs.field)
        impl = (
            _PallasAdapter(r1cs.field) if use_pallas else _JnpAdapter(r1cs.field)
        )
        parts, meta = build_row_sharded_parts(
            r1cs, n_dev, with_coeff_digits=(witness_form == "bits")
        )
        self._meta = meta
        rs_padded = meta["rows_padded"]
        buckets = meta["buckets"]
        coeff_limbs = jax.device_put(be.to_limbs(meta["coeff_table"]))

        shard_spec = NamedSharding(mesh, P(axis))
        dev = {}
        for name in ("a", "b", "c"):
            dev[name] = {
                k: jax.device_put(v, shard_spec)
                for k, v in parts[name].items()
            }
        row_origin = jax.device_put(meta["row_origin"], shard_spec)

        from jax import shard_map

        def matvec_local(name, z, local):
            cols = local[name]["cols"][0]  # [total]
            if witness_form == "bits":
                bv = jnp.take(z, cols)  # [total] u32 bits
                digits_lm = local[name]["cd"][0].T * bv[None]  # [32,total]
            else:
                zv = z[cols]  # [total, 16]
                cv = coeff_limbs[local[name]["cids"][0]]
                digits_lm = impl.mul_to_digits(zv, cv).T  # [32,total]
            parts_out = []
            for k, start, n_rows in buckets[name]:
                seg = digits_lm[:, start : start + n_rows * k]
                parts_out.append(
                    jnp.sum(seg.reshape(32, n_rows, k), axis=2, dtype=jnp.uint32)
                )
            rs = jnp.concatenate(parts_out, axis=1)  # [32, rs_padded]
            return impl.reduce_digits_lm(rs)  # [16, rs_padded]

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,  # pallas_call outputs carry no vma info
        )
        def check_local(z, a_local, b_local, c_local, origin_local):
            local = {"a": a_local, "b": b_local, "c": c_local}
            az = matvec_local("a", z, local)
            bz = matvec_local("b", z, local)
            cz = matvec_local("c", z, local)
            lhs = impl.mul_lm(az, bz)
            bad = jnp.any(lhs != cz, axis=0)  # [rs_padded] bucket order
            # padded rows have origin -1 and all-zero rows (0·0=0): never bad
            n_bad = jax.lax.psum(jnp.sum(bad.astype(jnp.uint32)), axis)
            shard = jax.lax.axis_index(axis).astype(jnp.uint32)
            orig = origin_local[0].astype(jnp.uint32) + shard * jnp.uint32(
                meta["rows_per_shard"]
            )
            sentinel = jnp.uint32(0xFFFFFFFF)
            first = jnp.min(jnp.where(bad, orig, sentinel))
            first = jax.lax.pmin(first, axis)
            return n_bad[None], first[None]

        @jax.jit
        def check(z, a_l, b_l, c_l, origin):
            na, first = check_local(z, a_l, b_l, c_l, origin)
            return na[0], first[0]

        # Pass the sharded layout as ARGUMENTS — closing over the index
        # arrays embeds them as HLO literals, which overflows the
        # remote-compile transport at 2^24 rows (hundreds of MB).
        parts_args = (dict(dev["a"]), dict(dev["b"]), dict(dev["c"]), row_origin)
        self._check = lambda z: check(z, *parts_args)
        self.backend = be

    def z_from_assignments(self, inputs, aux):
        return jnp.asarray(self.backend.to_limbs(list(inputs) + list(aux)))

    def is_satisfied(self, z) -> bool:
        n_bad, _ = self._check(z)
        return int(n_bad) == 0

    def which_is_unsatisfied(self, z) -> Optional[str]:
        n_bad, first = self._check(z)
        if int(n_bad) == 0:
            return None
        row = int(first)
        if self.r1cs.names is not None:
            return self.r1cs.names[row]
        return f"constraint #{row}"
