#!/usr/bin/env python
"""Profile the end-to-end detect program on the real chip and print a
per-op time breakdown parsed from the JAX profiler trace."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

OUT = "/tmp/pbd_trace"


def main():
    import jax
    from partsbaseddetector_tpu.models import synthetic
    from partsbaseddetector_tpu.infer.detector import Detector

    model = synthetic.person_like()
    model.thresh = 0.0
    det = Detector(model, k_per_level=64)
    rng = np.random.default_rng(0)
    im = (rng.random((480, 640, 3)) * 255).astype(np.float32)

    t0 = time.time()
    c = det.detect_raw(im)
    np.asarray(c.score)
    print(f"compile+first: {time.time()-t0:.2f}s", file=sys.stderr)
    for _ in range(2):
        t0 = time.time()
        c = det.detect_raw(im)
        np.asarray(c.score)
        print(f"steady: {time.time()-t0:.3f}s", file=sys.stderr)

    with jax.profiler.trace(OUT):
        for _ in range(3):
            c = det.detect_raw(im)
            np.asarray(c.score)

    # parse newest trace
    paths = sorted(glob.glob(os.path.join(
        OUT, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU device-side op events: pid whose process_name mentions TPU
    pidname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pidname.items()
                if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e.get("name", "")
            tot[nm] += e.get("dur", 0) / 1e6
            cnt[nm] += 1
    print(json.dumps({"pids": {str(k): v for k, v in pidname.items()
                               if k in dev_pids}}, indent=0),
          file=sys.stderr)
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"total device op time over 3 frames: {total:.3f}s "
          f"({total/3:.3f}s/frame)")
    for nm, s in rows[:40]:
        print(f"{s/3*1000:9.2f} ms/frame  x{cnt[nm]//3:<5d} {nm[:110]}")


if __name__ == "__main__":
    main()
