"""Actually-multi-process DCN path (VERDICT r2 item 3): spawn 2 local
processes, each with 4 virtual CPU devices, joined by
jax.distributed.initialize over localhost; run the sharded
witness+verdict step across them and assert verdict + z-shards bit-equal
the single-process run (asserted inside each worker against its local
shards). This exercises utils/multihost.py's non-fallback branch."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_verdict(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]

    env = dict(os.environ)
    # The workers force the CPU platform in-process (the axon sitecustomize
    # overrides JAX_PLATFORMS); each must NOT inherit pytest's 8-device
    # XLA_FLAGS — the worker sets its own 4-device flag.
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), outs[i]],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    results = []
    for i, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out")
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\n"
            f"stdout: {stdout.decode()[-2000:]}\n"
            f"stderr: {stderr.decode()[-2000:]}"
        )
        with open(outs[i]) as f:
            results.append(json.load(f))

    for i, r in enumerate(results):
        assert r["process_count"] == 2, r
        assert r["total"] == 0, f"worker {i} saw violations: {r}"
        assert r["shard_ok"], f"worker {i} z-shards mismatch: {r}"
        assert r["n_local_shards"] == 4, r
        assert r["ok"], r
