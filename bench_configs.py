#!/usr/bin/env python
"""Per-config benchmark artifact runner.

Runs every BASELINE config harness (1, 2, 3, 4, 4b, 5) sequentially as
subprocesses — each gets a fresh process so one TPU-worker crash cannot
poison the rest — collects their JSON lines, and writes them to a single
artifact file (default BENCH_CONFIGS.json) so per-config numbers are
committed facts rather than commit-message claims.

Usage: python bench_configs.py [out.json]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# (harness argv, expected number of JSON lines)
RUNS = [
    ([sys.executable, "benchmarks/configs_1_2_3.py"], 3),
    ([sys.executable, "benchmarks/config4_merkle_1024.py"], 3),
    ([sys.executable, "benchmarks/config5_synthetic_r1cs.py", "24", "1"], 1),
]

# Transient axon-tunnel failures (worker crash/restart) warrant one fresh
# retry per harness; deterministic failures must surface, not loop.
_TRANSIENT = (
    "UNAVAILABLE",
    "crashed",
    "restarted",
    "socket",
    "response body closed",  # axon tunnel HTTP stream dropped mid-compile
    "read body",
)


def _run(argv, timeout=3000):
    try:
        p = subprocess.run(
            argv,
            cwd=HERE,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired as e:
        # record the timeout as a failure instead of aborting the whole
        # sweep (and losing every other harness's fresh numbers)
        return 124, [], f"timeout after {timeout}s: {e}"
    lines = [
        json.loads(ln)
        for ln in p.stdout.splitlines()
        if ln.startswith("{")
    ]
    return p.returncode, lines, p.stderr


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_CONFIGS.json"
    results, failures = [], []
    for argv, n_expect in RUNS:
        name = " ".join(os.path.basename(a) for a in argv[1:])
        t0 = time.time()
        code, lines, err = _run(argv)
        if code != 0 and any(t in err for t in _TRANSIENT):
            print(f"# transient failure in {name}; retrying once", file=sys.stderr)
            time.sleep(20)
            code, lines, err = _run(argv)
        dt = time.time() - t0
        if code != 0 or len(lines) != n_expect:
            failures.append({"harness": name, "exit": code, "stderr_tail": err[-800:]})
            print(f"# FAILED {name} (exit {code})", file=sys.stderr)
            continue
        for ln in lines:
            ln["harness"] = name
            ln["wall_s"] = round(dt, 1)
            results.append(ln)
            print(json.dumps(ln))
    artifact = {
        "generated_unix": int(time.time()),
        "results": results,
        "failures": failures,
    }
    with open(os.path.join(HERE, out_path), "w") as f:
        json.dump(artifact, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
