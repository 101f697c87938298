"""Multi-PROCESS distributed execution test.

Launches two OS processes that form one jax.distributed job (CPU
coordination service on localhost, 2 virtual devices per process — a
4-device global mesh across process boundaries) and run the sharded
batch detector on a global frame batch.  This exercises
parallel/distributed.initialize + BatchDetector.detect_batch_distributed
end to end — the real multi-controller path, which the in-process
virtual-mesh tests (tests/test_parallel.py) cannot reach.  SURVEY.md
§4(d) planned exactly this simulation.
"""

import json
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, nproc, dev_per_proc, mesh_shape=None,
                 timeout=540):
    port = _free_port()
    procs = []
    env = dict(os.environ)
    env["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={dev_per_proc}"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    extra = [str(x) for x in mesh_shape] if mesh_shape else []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             str(tmp_path)] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    ndev = nproc * dev_per_proc
    covered = set()
    for pid in range(nproc):
        with open(tmp_path / f"p{pid}.json") as f:
            rec = json.load(f)
        assert rec["ok"], rec
        assert rec["ndev"] == ndev
        assert rec["checked"] == len(rec["owned"])
        covered.update(rec["owned"])
    # every global frame verified by at least one process (on a 2-D
    # mesh, frames on a shared data row are verified by several)
    assert covered == set(range(ndev))


def test_two_process_distributed_detection(tmp_path):
    _run_workers(tmp_path, nproc=2, dev_per_proc=2)


def test_four_process_2d_mesh_distributed_detection(tmp_path):
    """4 processes x 1 device on a (data=2, filter=2) mesh — the
    production 2-D mesh shape with BOTH axes crossing process
    boundaries, so the conv-response all-gather along ``filter`` and
    the batch sharding along ``data`` each ride cross-process
    collectives (SURVEY.md §2.4's DCN+ICI story)."""
    _run_workers(tmp_path, nproc=4, dev_per_proc=1,
                 mesh_shape=(2, 2), timeout=540)
