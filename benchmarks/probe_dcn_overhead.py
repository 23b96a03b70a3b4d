#!/usr/bin/env python
"""DCN (cross-process) overhead probe.

Same total workload, same 8-device mesh program, two process layouts:
  A: 1 process × 8 virtual CPU devices (collectives stay in-process);
  B: 2 processes × 4 devices joined by jax.distributed (verdict psum and
     any cross-shard traffic cross the process boundary via gloo).

The step-time ratio t_A / t_B is the measurable proxy for multi-host
(DCN) overhead in this hardware-less image: the program structure and
arithmetic are identical, only the transport changes. On real pod
hardware the same launcher (utils/multihost.py) runs this over DCN.

Prints one JSON line. Usage: probe_dcn_overhead.py [B] [rounds]
"""

import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(n_procs: int, dev_per_proc: int, B: int, rounds: int):
    port = _free_port()
    worker = os.path.join(HERE, "dcn_worker.py")
    outs = [f"/tmp/dcn_{n_procs}p_{i}.json" for i in range(n_procs)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable, worker, str(n_procs), str(i), str(port),
                str(dev_per_proc), outs[i], str(B), str(rounds),
            ],
            cwd=os.path.dirname(HERE),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(n_procs)
    ]
    for i, p in enumerate(procs):
        stdout, stderr = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {i} rc={p.returncode}\n{stderr.decode()[-2000:]}"
            )
    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    assert all(r["ok"] for r in results), results
    return max(r["step_s"] for r in results), results[0]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    t1, r1 = _run(1, 8, B, rounds)
    t2, r2 = _run(2, 4, B, rounds)
    print(
        json.dumps(
            {
                "metric": "2-process (DCN-proxy) step-time efficiency vs 1-process",
                "value": round(t1 / t2, 4),
                "unit": "ratio (>= 1.0 means no cross-process overhead)",
                "detail": {
                    "batch": B,
                    "constraints_per_step": r1["constraints"],
                    "step_s_1proc_x8dev": round(t1, 4),
                    "step_s_2proc_x4dev": round(t2, 4),
                    "devices_total": 8,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
