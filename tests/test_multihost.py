"""True multi-process (multi-"host") distributed SpMM over gloo.

SURVEY §4 TPU plan: "multi-host tests on CPU backend via jax.distributed".
Spawns 2 worker processes that federate into a 4-device global mesh and run
the halo-exchange SpMM; each checks against the float64 host gold.
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(port: int):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "multihost_smoke.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def test_two_process_halo_spmm():
    # the free-port probe is racy (released before the coordinator binds):
    # retry once on a fresh port before failing
    for attempt in range(2):
        procs, outs = _run_workers(_free_port())
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"
        assert "MULTIHOST OK" in out, f"proc {pid}:\n{out[-3000:]}"
