#!/usr/bin/env python
"""Measure the OpenMP CPU baseline (reference-structure native engine,
native/pbd_native.cpp) on this machine and record baseline_cpu.json.

The reference publishes no performance numbers (BASELINE.md), so the
operative baseline is measured: same workload as bench.py (person-26
model, 640x480, full pyramid), reference algorithm structure (per-channel
spatial correlation, O(N) envelope DT, OpenMP loop parallelism at the
reference's four sites)."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")


def main():
    subprocess.run(["make", "-C", NATIVE, "pbd_baseline"], check=True)
    exe = os.path.join(NATIVE, "pbd_baseline")
    out = subprocess.run([exe, "480", "640", "3"], check=True,
                         capture_output=True, text=True).stdout
    res = json.loads(out)
    ncpu = os.cpu_count()
    rec = {
        "fps": res["fps"],
        "sec_per_frame": res["sec_per_frame"],
        "nscales": res["nscales"],
        "img": res["img"],
        "ncpu": ncpu,
        "engine": "native/pbd_native.cpp (C++ OpenMP, reference "
                  "algorithm structure)",
    }
    path = os.path.join(ROOT, "baseline_cpu.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
