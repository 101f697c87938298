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


def test_two_process_distributed_detection(tmp_path):
    port = _free_port()
    nproc = 2
    procs = []
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    total_checked = 0
    for pid in range(nproc):
        with open(tmp_path / f"p{pid}.json") as f:
            rec = json.load(f)
        assert rec["ok"], rec
        assert rec["ndev"] == 4
        total_checked += rec["checked"]
    assert total_checked == 4          # every global frame verified
