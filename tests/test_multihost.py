"""Multi-host scaffolding tests — the single-process degenerate case on
the virtual 8-device CPU mesh. Real DCN execution needs a multi-process
launcher (utils/multihost.py docstring); these tests pin the process-level
glue: env-var contract, global mesh construction, local->global batch
assembly, and the sharded verdict step built through the multihost API.

Reference seam being scaled out: constraint_system.rs:138-148 (extend).
"""

import numpy as np
import jax
import jax.numpy as jnp

from bellpepper_tpu.utils.multihost import (
    global_mesh,
    initialize_multihost,
    make_global_batch,
    multihost_verdict_step,
)


def test_initialize_single_process_fallback(monkeypatch):
    # No launcher env vars -> stays single-process, returns False.
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False
    # Partial/invalid env still falls back rather than hanging in init.
    assert initialize_multihost("127.0.0.1:1234", num_processes=1) is False
    assert initialize_multihost("127.0.0.1:1234", 4, -1) is False


def test_global_mesh_spans_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_make_global_batch_single_process():
    mesh = global_mesh()
    n = mesh.devices.size
    local = np.arange(n * 3, dtype=np.uint32).reshape(n * 3, 1)
    arr = make_global_batch(local, mesh)
    assert arr.shape == (n * 3, 1)
    np.testing.assert_array_equal(np.asarray(arr), local)
    # Sharded over the data axis: each device holds a contiguous slice.
    assert len(arr.sharding.device_set) == n


def _bits_template():
    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.uint32 import UInt32
    from bellpepper_tpu.r1cs import ShapeCS

    def circuit(cs):
        a = UInt32.alloc(cs.namespace("a"), None)
        b = UInt32.alloc(cs.namespace("b"), None)
        a.xor(cs.namespace("x"), b.rotr(11))

    shape = ShapeCS()
    circuit(shape)
    tape = TapeCS()
    circuit(tape)
    return shape.finish(), WitnessProgram(tape)


def test_multihost_verdict_step_virtual_mesh():
    template, prog = _bits_template()
    mesh = global_mesh()
    n = mesh.devices.size
    B = 2 * n
    step, in_sharding = multihost_verdict_step(prog, template, B, mesh)

    rng = np.random.default_rng(17)
    free = rng.integers(0, 2, size=(B, len(prog.free_slots))).astype(
        np.uint32
    )
    gbatch = make_global_batch(free, mesh)
    total, z3 = step(gbatch)
    assert int(total) == 0
    assert z3.shape[0] == B
