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
    from partsbaseddetector_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = 0
    dp_split = 5
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        if a.startswith("--dp-split="):
            dp_split = int(a.split("=", 1)[1])

    model = synthetic.person_like()
    model.thresh = 0.0
    det = Detector(model, k_per_level=64, dp_split=dp_split)
    rng = np.random.default_rng(0)
    if batch:
        im = (rng.random((batch, 480, 640, 3)) * 255).astype(np.uint8)
        run = det.detect_batch_raw
    else:
        im = (rng.random((480, 640, 3)) * 255).astype(np.float32)
        run = det.detect_raw
    nframes = batch or 1

    t0 = time.time()
    c = run(im)
    np.asarray(c.score)
    print(f"compile+first: {time.time()-t0:.2f}s", file=sys.stderr)
    for _ in range(2):
        t0 = time.time()
        c = run(im)
        np.asarray(c.score)
        print(f"steady: {time.time()-t0:.3f}s "
              f"({(time.time()-t0)/nframes*1000:.1f} ms/frame)",
              file=sys.stderr)

    with jax.profiler.trace(OUT):
        for _ in range(3):
            c = run(im)
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
    nf = 3 * nframes
    print(f"total device op time over {nf} frames: {total:.3f}s "
          f"({total/nf*1000:.2f} ms/frame) [nested spans double-count]")
    for nm, s in rows[:40]:
        print(f"{s/nf*1000:9.3f} ms/frame  x{cnt[nm]//3:<5d} {nm[:110]}")
    tail = rows[40:]
    if tail:
        ts = sum(s for _, s in tail)
        tc = sum(cnt[nm] for nm, _ in tail) // 3
        print(f"{ts/nf*1000:9.3f} ms/frame  x{tc:<5d} "
              f"[{len(tail)} distinct ops below top-40]")
        # aggregate the tail by op-name prefix for a category view
        pref = defaultdict(float)
        for nm, s in tail:
            pref[nm.split(".")[0]] += s
        for nm, s in sorted(pref.items(), key=lambda kv: -kv[1])[:15]:
            print(f"    tail {s/nf*1000:8.3f} ms/frame  {nm[:90]}")


if __name__ == "__main__":
    main()
