"""Worker process for the 2-process jax.distributed test (not collected
by pytest — launched by tests/test_multihost_2proc.py).

Each of the 2 processes owns 4 virtual CPU devices; jax.distributed
joins them into one 8-device runtime. The worker runs the sharded
witness+verdict step over the global mesh and asserts its local z-shards
bit-equal an unsharded single-process evaluation of the same instances —
the extend associativity property (constraint_system.rs:138-148) at host
scope.

Usage: python tests/multihost_worker.py <port> <process_id> <out_json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Cross-process CPU collectives need a real implementation (psum over
    # the coordination service's gloo backend).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer knob name; default may already work

    import numpy as np

    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.uint32 import UInt32
    from bellpepper_tpu.r1cs import ShapeCS
    from bellpepper_tpu.utils.multihost import (
        global_mesh,
        initialize_multihost,
        make_global_batch,
        multihost_verdict_step,
    )

    assert initialize_multihost(f"127.0.0.1:{port}", 2, pid) is True
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    def circuit(cs):
        a = UInt32.alloc(cs.namespace("a"), None)
        b = UInt32.alloc(cs.namespace("b"), None)
        c = a.xor(cs.namespace("x"), b.rotr(11))
        from bellpepper_tpu.gadgets.multieq import MultiEq

        with MultiEq(cs) as mcs:
            UInt32.addmany(mcs.namespace("s"), [a, b, c])

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)

    mesh = global_mesh()
    B = 16
    rng = np.random.default_rng(17)  # same seed in both processes
    free_global = rng.integers(0, 2, size=(B, len(prog.free_slots))).astype(
        np.uint32
    )
    local = free_global[pid * (B // 2) : (pid + 1) * (B // 2)]
    gbatch = make_global_batch(local, mesh)

    step, _ = multihost_verdict_step(prog, template, B, mesh)
    total, z3 = step(gbatch)
    total = int(total)

    # Single-process reference on the FULL batch (local, unsharded).
    vals_ref, _fl = prog.run(free_global)
    vals_ref = np.asarray(vals_ref)

    shard_ok = True
    n_shards = 0
    for s in z3.addressable_shards:
        lo = s.index[0].start or 0
        got = np.asarray(s.data)
        want = vals_ref[lo : lo + got.shape[0]]
        if not np.array_equal(got, want):
            shard_ok = False
        n_shards += 1

    with open(out_path, "w") as f:
        json.dump(
            {
                "ok": total == 0 and shard_ok and n_shards == 4,
                "total": total,
                "shard_ok": shard_ok,
                "n_local_shards": n_shards,
                "process_count": jax.process_count(),
            },
            f,
        )


if __name__ == "__main__":
    main()
