#!/usr/bin/env python
"""Data-parallel scaling measurement: BatchDetector throughput vs mesh
size, with efficiency relative to 1 device.

On real multi-chip hardware this produces the BASELINE.md scaling
number (target >= 80% efficiency at N >= 2).  On this image only one
TPU chip is attached, so by default it runs on a virtual CPU mesh
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count) — that
validates the scaling HARNESS and the sharding's weak-scaling shape,
but the absolute ratios are bounded by the 2 physical cores and are
recorded as such (see SCALING.md).

Usage:
  python tools/measure_scaling.py [--devices 8] [--img 96] [--batch-per 1]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count (CPU mode)")
    ap.add_argument("--img", type=int, default=96)
    ap.add_argument("--batch-per", type=int, default=1,
                    help="frames per device (weak scaling)")
    ap.add_argument("--real", action="store_true",
                    help="use the attached real devices as-is")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if not args.real:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    if not args.real:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from partsbaseddetector_tpu.models import synthetic
    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    model = synthetic.person_like()
    model.thresh = 0.0
    ndev_all = len(jax.devices())
    rng = np.random.default_rng(0)

    results = []
    n = 1
    sizes = []
    while n <= ndev_all:
        sizes.append(n)
        n *= 2
    for n in sizes:
        mesh = make_mesh((n, 1), devices=jax.devices()[:n])
        bdet = BatchDetector(model, mesh, k_per_level=16)
        B = n * args.batch_per
        images = (rng.random((B, args.img, args.img, 3)) * 255
                  ).astype(np.float32)
        out = bdet.detect_batch(images)           # compile + warm
        jax.block_until_ready(out.score)
        t0 = time.time()
        for _ in range(args.reps):
            out = bdet.detect_batch(images)
        jax.block_until_ready(out.score)
        dt = (time.time() - t0) / args.reps
        fps = B / dt
        results.append({"ndev": n, "batch": B, "sec": dt, "fps": fps})
        print(f"N={n}: {fps:.2f} frames/s ({dt*1e3:.1f} ms for B={B})",
              file=sys.stderr)

    base = results[0]["fps"]
    for r in results:
        r["speedup"] = r["fps"] / base
        r["efficiency"] = r["speedup"] / r["ndev"]
    rec = {
        "mode": "real" if args.real else
                f"virtual-cpu x{args.devices} (2 physical cores)",
        "img": args.img,
        "weak_scaling_frames_per_device": args.batch_per,
        "results": results,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
