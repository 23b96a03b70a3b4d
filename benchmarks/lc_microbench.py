#!/usr/bin/env python
"""LC microbenchmarks — parity with the reference's criterion harness
(crates/bellpepper-core/benches/lc.rs): 100 × `lc + (coeff, var)` and
10 × `lc + &lc2` over 10-term LCs. Also benches the native C++ builder's
LC path for comparison.

Prints one JSON line."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import random
import time


def main():
    from bellpepper_tpu import SCALAR, LinearCombination
    from bellpepper_tpu.lc import Index, Variable

    rng = random.Random(1)

    # bench 1: 100 sequential adds of (coeff, var) — lc.rs:7-16
    def add_100():
        lc = LinearCombination.zero(SCALAR)
        for i in range(100):
            lc = lc + (SCALAR.rand(rng), Variable(Index.aux(i)))
        return lc

    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        add_100()
    t_add = (time.perf_counter() - t0) / n

    # bench 2: 10 × lc + &lc2, both 10-term — lc.rs:17-35
    def make10(base):
        lc = LinearCombination.zero(SCALAR)
        for i in range(10):
            lc = lc + (SCALAR.rand(rng), Variable(Index.aux(base + i)))
        return lc

    lc2 = make10(0)

    def add_lc_10():
        lc = make10(5)
        for _ in range(10):
            lc = lc + lc2
        return lc

    t0 = time.perf_counter()
    for _ in range(n):
        add_lc_10()
    t_merge = (time.perf_counter() - t0) / n

    print(
        json.dumps(
            {
                "metric": "LC microbenches (criterion parity)",
                "value": round(100 / t_add, 1),
                "unit": "term-adds/s",
                "detail": {
                    "lc_add_100_us": round(t_add * 1e6, 1),
                    "lc_merge_10x10_us": round(t_merge * 1e6, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
