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

Usage: python mp_worker.py <pid> <nproc> <port> <outdir> [ndata nfilt]

The optional trailing args pick the global mesh shape (data, filter);
default (ndev, 1).  A 2-D shape with nproc > ndata exercises
cross-process collectives along the FILTER axis (the all-gather of
sharded conv responses riding the process boundary — the production
2-D mesh of SURVEY.md §2.4).
"""

import json
import os
import sys
import time
import traceback


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    mesh_shape = (tuple(int(x) for x in sys.argv[5:7])
                  if len(sys.argv) >= 7 else None)

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
    if mesh_shape is None:
        mesh_shape = (ndev, 1)
    assert mesh_shape[0] * mesh_shape[1] == ndev, (mesh_shape, ndev)
    B = ndev                    # divisible by the data axis either way
    images = (rng.random((B, 48, 48, 3)) * 255).astype(np.float32)

    mesh = make_mesh(mesh_shape)
    bdet = BatchDetector(model, mesh, k_per_level=8)
    # frames this process owns under the mesh's data axis (on a 2-D
    # mesh, processes sharing a data row pass the SAME rows)
    slices = bdet.local_frame_slices(B)
    local = bdet.local_frames(images)
    owned = [g for a, b in slices for g in range(a, b)]
    t0 = time.time()
    out = bdet.detect_batch_distributed(local)
    jax.block_until_ready(out.score)
    elapsed = time.time() - t0

    # full host copy on every process (DCN-style result merge), then an
    # independent single-device check of the frames THIS process fed in
    full = multihost_utils.process_allgather(out, tiled=True)
    det = Detector(model, k_per_level=8, dp_split=bdet.dp_split)
    checked = 0
    for g in owned:
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
        if got.keys() != ref.keys():
            only_got = {k: got[k] for k in set(got) - set(ref)}
            only_ref = {k: ref[k] for k in set(ref) - set(got)}
            raise AssertionError(
                f"frame {g}: key mismatch; only_got="
                f"{sorted(only_got.items())[:6]} only_ref="
                f"{sorted(only_ref.items())[:6]}")
        for k in got:
            assert abs(got[k] - ref[k]) < 5e-4, (g, k, got[k], ref[k])
        checked += 1

    with open(os.path.join(outdir, f"p{pid}.json"), "w") as f:
        json.dump({"ok": True, "pid": pid, "checked": checked,
                   "owned": owned, "ndev": ndev,
                   "elapsed_s": elapsed}, f)
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
