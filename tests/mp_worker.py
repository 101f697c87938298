"""Worker process for the multi-process distributed test
(tests/test_multiprocess.py) — NOT a pytest file.

Each worker is one jax.distributed process with N virtual CPU devices;
two workers form a 2N-device global mesh spanning 2 processes.  The
worker runs BatchDetector.detect_batch_distributed on its local slice
of a global frame batch, allgathers the global result, and checks the
frames it contributed against an independent single-device detection —
the multi-host execution path of SURVEY.md §2.4 exercised for real
(two OS processes, coordination service over localhost, DCN-style
addressing), which a single-process virtual mesh cannot do.

Usage: python mp_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys
import time
import traceback


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")   # sitecustomize forces axon
    import numpy as np
    from jax.experimental import multihost_utils

    from partsbaseddetector_tpu.parallel import distributed
    distributed.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    ndev_local = len(jax.local_devices())
    ndev = len(jax.devices())
    assert ndev == nproc * ndev_local, (ndev, ndev_local)

    from partsbaseddetector_tpu.infer.detector import Detector
    from partsbaseddetector_tpu.models import synthetic
    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    model = synthetic.tiny(seed=3)
    model.thresh = -1e9
    rng = np.random.default_rng(11)          # same batch on every process
    B = ndev
    images = (rng.random((B, 48, 48, 3)) * 255).astype(np.float32)
    per = B // nproc
    local = images[pid * per:(pid + 1) * per]

    mesh = make_mesh((ndev, 1))
    bdet = BatchDetector(model, mesh, k_per_level=8)
    t0 = time.time()
    out = bdet.detect_batch_distributed(local)
    jax.block_until_ready(out.score)
    elapsed = time.time() - t0

    # full host copy on every process (DCN-style result merge), then an
    # independent single-device check of the frames THIS process fed in
    full = multihost_utils.process_allgather(out, tiled=True)
    det = Detector(model, k_per_level=8, dp_split=bdet.dp_split)
    checked = 0
    for g in range(pid * per, (pid + 1) * per):
        single = det.detect_raw(images[g])

        def entries(score, valid, loc, level):
            return {(int(l), tuple(map(tuple, x))): float(s)
                    for s, v, x, l in zip(np.asarray(score),
                                          np.asarray(valid),
                                          np.asarray(loc),
                                          np.asarray(level)) if v}
        got = entries(full.score[g], full.valid[g], full.loc[g],
                      full.level[g])
        ref = entries(single.score, single.valid, single.loc,
                      single.level)
        assert got.keys() == ref.keys(), (
            f"frame {g}: {len(got)} vs {len(ref)} candidate keys")
        for k in got:
            assert abs(got[k] - ref[k]) < 5e-4, (g, k, got[k], ref[k])
        checked += 1

    with open(os.path.join(outdir, f"p{pid}.json"), "w") as f:
        json.dump({"ok": True, "pid": pid, "checked": checked,
                   "ndev": ndev, "elapsed_s": elapsed}, f)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        with open(os.path.join(sys.argv[4],
                               f"p{sys.argv[1]}.json"), "w") as f:
            json.dump({"ok": False, "pid": int(sys.argv[1]),
                       "error": traceback.format_exc()}, f)
        sys.exit(1)
