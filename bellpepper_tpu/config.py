"""Runtime configuration for the TPU execution layer.

The reference configures everything through Rust type parameters (the
field and the CS backend — SURVEY §5 "Config / flag system"); a runtime
framework needs an actual config object: mesh geometry, witness form,
kernel selection, shard sizes, and limb precision live here instead of
being scattered constructor kwargs.

`Config` is a frozen dataclass so one instance can be shared across
satisfiers, witness programs, and benchmarks. Every consumer accepts
``config=`` and falls back to `default_config()`.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field, replace
from typing import Optional, Tuple

from .fields import SCALAR, PrimeField


@dataclass(frozen=True)
class Config:
    # Field choice (any PrimeField ≤ 255 bits; BLS12-381 Fr default).
    field: PrimeField = SCALAR
    # Kernel selection: None = auto (Pallas on TPU backends, jnp elsewhere).
    use_pallas: Optional[bool] = None
    # Witness value domain: "limbs" (general field values) or "bits"
    # (0/1-valued witnesses — hash circuits; enables the masked fast path).
    witness_form: str = "limbs"
    # Mesh geometry: number of devices (None = all local) and axis name.
    mesh_devices: Optional[int] = None
    mesh_axis: str = "data"
    # Instance-batch size for templated satisfiers; must divide over the
    # mesh. Constraint-axis shard count for row-sharded checks (None =
    # one shard per mesh device).
    batch: int = 1
    row_shards: Optional[int] = None
    # Pallas batch tile (8 sublanes × 128 lanes) and limb precision.
    # These document the kernel contract; only the shipped values are
    # implemented (the kernels bake them in as layout constants).
    tile: int = 1024
    limb_bits: int = 16

    def __post_init__(self):
        if self.witness_form not in ("limbs", "bits"):
            raise ValueError(f"witness_form: {self.witness_form!r}")
        if self.tile != 1024:
            raise ValueError("tile: only 1024 (8×128) is implemented")
        if self.limb_bits != 16:
            raise ValueError("limb_bits: only 16-bit limbs are implemented")
        if self.batch < 1:
            raise ValueError("batch must be >= 1")

    # -- derived ----------------------------------------------------------
    def make_mesh(self):
        from .backend.sharding import default_mesh

        return default_mesh(self.mesh_devices, self.mesh_axis)

    def with_(self, **kw) -> "Config":
        return replace(self, **kw)


_DEFAULT: Optional[Config] = None


def default_config() -> Config:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = Config()
    return _DEFAULT


def set_default_config(cfg: Config) -> None:
    global _DEFAULT
    _DEFAULT = cfg
