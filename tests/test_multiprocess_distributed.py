"""Two-process distributed smoke: init_distributed + all_gather_object
actually run with process_count > 1 (VERDICT r1 Next #9; reference
surface: pretrain_src utils/distributed.py:66-131 NCCL rendezvous +
pickle allgather, ss_trainer_ETP.py:727-738 eval-dict merge).

Each worker is a separate python process on the CPU backend; the
coordinator is rank 0. The gathered objects have different structures
per rank (different episode ids), which is exactly the case a
pytree-based gather cannot handle.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from etpnav_tpu.parallel import mesh as M

pid, port = int(sys.argv[1]), sys.argv[2]
ok = M.init_distributed(f"localhost:{port}", 2, pid)
assert ok, "init_distributed did not activate a multi-process runtime"
assert jax.process_count() == 2, jax.process_count()

# rank-dependent structure: rank 0 has 2 episodes, rank 1 has 3
stats = {f"ep{pid}_{i}": {"sr": float(pid), "spl": 0.5 + i}
         for i in range(2 + pid)}
out = M.all_gather_object(stats)
assert len(out) == 2, out
merged = {}
for d in out:
    merged.update(d)
assert len(merged) == 5, sorted(merged)
assert merged["ep1_2"]["sr"] == 1.0
print("GATHER_OK", len(merged), "rank", pid, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process: drop the virtual-mesh flag the parent
    # test process uses
    env["XLA_FLAGS"] = ""
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"), REPO] if p)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-2000:]}"
        assert "GATHER_OK 5" in out, out
