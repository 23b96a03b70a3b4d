"""Frozen public-API snapshot: the analogue of the reference CI's
downstream-consumer compile check (reference .github/workflows/rust.yml:44-76
builds lurk-rs against the crate). With no downstream consumer to compile,
this pins the public surface — module exports and callable signatures — so
accidental breaks (renamed method, changed parameter, dropped export) fail
loudly instead of silently rippling into user code.

Regenerate intentionally with:
    python tests/test_api_surface.py --regen
then review the diff of tests/api_surface.json like any API change.
"""

import inspect
import json
import os

SNAPSHOT = os.path.join(os.path.dirname(__file__), "api_surface.json")

# The supported public surface: every module a reference user would touch
# (gadgets, CS impls, serialization) plus the TPU-native layers the
# framework adds (backends, compile pipeline, native builder).
MODULES = [
    "bellpepper_tpu",
    "bellpepper_tpu.constraint_system",
    "bellpepper_tpu.lc",
    "bellpepper_tpu.fields",
    "bellpepper_tpu.r1cs",
    "bellpepper_tpu.config",
    "bellpepper_tpu.gadgets",
    "bellpepper_tpu.gadgets.boolean",
    "bellpepper_tpu.gadgets.boolean_utils",
    "bellpepper_tpu.gadgets.num",
    "bellpepper_tpu.gadgets.uint32",
    "bellpepper_tpu.gadgets.multieq",
    "bellpepper_tpu.gadgets.multipack",
    "bellpepper_tpu.gadgets.lookup",
    "bellpepper_tpu.gadgets.sha256",
    "bellpepper_tpu.gadgets.blake2s",
    "bellpepper_tpu.util_cs",
    "bellpepper_tpu.util_cs.test_cs",
    "bellpepper_tpu.util_cs.witness_cs",
    "bellpepper_tpu.util_cs.metric_cs",
    "bellpepper_tpu.util_cs.bench_cs",
    "bellpepper_tpu.backend.field_jnp",
    "bellpepper_tpu.backend.matvec",
    "bellpepper_tpu.backend.sharding",
    "bellpepper_tpu.compile.tape",
    "bellpepper_tpu.compile.witness_program",
    "bellpepper_tpu.compile.pipeline",
    "bellpepper_tpu.native",
    "bellpepper_tpu.utils.serialize",
    "bellpepper_tpu.utils.multihost",
    "bellpepper_tpu.utils.profiling",
]


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "<no-signature>"


def _public_names(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    return sorted(names)


def snapshot_surface() -> dict:
    import importlib

    surface = {}
    for modname in MODULES:
        mod = importlib.import_module(modname)
        entry = {}
        for name in _public_names(mod):
            obj = getattr(mod, name)
            # skip re-exported submodules and third-party objects
            if inspect.ismodule(obj):
                continue
            owner = getattr(obj, "__module__", "") or ""
            if owner and not owner.startswith("bellpepper_tpu"):
                if not isinstance(obj, (int, str, tuple, list, dict)):
                    continue
            if inspect.isclass(obj):
                methods = {}
                for mn, mv in sorted(vars(obj).items()):
                    if mn.startswith("_") and mn not in ("__init__",):
                        continue
                    if isinstance(mv, (staticmethod, classmethod)):
                        mv = mv.__func__
                    if callable(mv):
                        methods[mn] = _sig(mv)
                    elif isinstance(mv, property):
                        methods[mn] = "<property>"
                entry[name] = {"kind": "class", "methods": methods}
            elif callable(obj):
                entry[name] = {"kind": "function", "sig": _sig(obj)}
            else:
                entry[name] = {"kind": "value", "type": type(obj).__name__}
        surface[modname] = entry
    return surface


def test_api_surface_frozen():
    with open(SNAPSHOT) as f:
        frozen = json.load(f)
    current = snapshot_surface()
    # Per-module diff for a readable failure message.
    problems = []
    for modname, entry in frozen.items():
        cur = current.get(modname)
        if cur is None:
            problems.append(f"module missing: {modname}")
            continue
        for name, spec in entry.items():
            got = cur.get(name)
            if got is None:
                problems.append(f"{modname}.{name}: REMOVED")
            elif got != spec:
                problems.append(
                    f"{modname}.{name}: changed\n  frozen:  {spec}\n  current: {got}"
                )
    # New additions are allowed (surface can grow); removals/changes fail.
    assert not problems, (
        "public API surface changed vs tests/api_surface.json "
        "(regen with `python tests/test_api_surface.py --regen` "
        "if intentional):\n" + "\n".join(problems[:40])
    )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import jax

        jax.config.update("jax_platforms", "cpu")
        with open(SNAPSHOT, "w") as f:
            json.dump(snapshot_surface(), f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {SNAPSHOT}")
    else:
        print(__doc__)
