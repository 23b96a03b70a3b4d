"""Worker for the DCN overhead probe (launched by probe_dcn_overhead.py).

Runs the sharded witness+verdict step over a mesh of
n_procs × dev_per_proc virtual CPU devices and times warm steps. With
n_procs=2 the same program spans two OS processes joined by
jax.distributed (gloo collectives) — the measurable proxy for the
cross-host DCN overhead that the ≥85% multi-host scaling target
depends on (the hardware itself is not available in this image).

Usage: dcn_worker.py <n_procs> <pid> <port> <dev_per_proc> <out_json> [B] [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_procs = int(sys.argv[1])
    pid = int(sys.argv[2])
    port = sys.argv[3]
    dev_per_proc = int(sys.argv[4])
    out_path = sys.argv[5]
    B = int(sys.argv[6]) if len(sys.argv) > 6 else 256
    rounds = int(sys.argv[7]) if len(sys.argv) > 7 else 12

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dev_per_proc}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    import numpy as np

    from bellpepper_tpu.compile.tape import TapeCS
    from bellpepper_tpu.compile.witness_program import WitnessProgram
    from bellpepper_tpu.gadgets.multieq import MultiEq
    from bellpepper_tpu.gadgets.uint32 import UInt32
    from bellpepper_tpu.r1cs import ShapeCS
    from bellpepper_tpu.utils.multihost import (
        global_mesh,
        initialize_multihost,
        make_global_batch,
        multihost_verdict_step,
    )

    if n_procs > 1:
        assert initialize_multihost(f"127.0.0.1:{port}", n_procs, pid)
        assert jax.process_count() == n_procs

    def circuit(cs):
        words = [UInt32.alloc(cs.namespace(f"w{i}"), None) for i in range(8)]
        with MultiEq(cs) as mcs:
            acc = words[0]
            for r in range(rounds):
                acc = UInt32.addmany(
                    mcs.namespace(f"add {r}"), [acc, words[(r + 1) % 8]]
                )
                acc = acc.xor(mcs.namespace(f"x {r}"), words[(r + 3) % 8].rotr(r % 31 + 1))

    shape = ShapeCS()
    circuit(shape)
    template = shape.finish()
    tape = TapeCS()
    circuit(tape)
    prog = WitnessProgram(tape)

    mesh = global_mesh()
    rng = np.random.default_rng(23)  # same seed in every process
    free_global = rng.integers(0, 2, size=(B, len(prog.free_slots))).astype(
        np.uint32
    )
    per = B // n_procs
    local = free_global[pid * per : (pid + 1) * per]
    gbatch = make_global_batch(local, mesh)

    step, _ = multihost_verdict_step(prog, template, B, mesh)
    # Warm (compile + settle); int() syncs and acts as a barrier.
    total, _z = step(gbatch)
    ok = int(total) == 0
    total, _z = step(gbatch)
    ok = ok and int(total) == 0

    reps = 6
    t0 = time.time()
    for _ in range(reps):
        total, _z = step(gbatch)
        ok = ok and int(total) == 0  # per-rep sync = honest barrier
    dt = (time.time() - t0) / reps

    with open(out_path, "w") as f:
        json.dump(
            {
                "ok": ok,
                "step_s": dt,
                "constraints": B * template.num_constraints,
                "n_procs": n_procs,
                "devices": len(jax.devices()),
            },
            f,
        )


if __name__ == "__main__":
    main()
