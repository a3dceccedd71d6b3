"""REAL multi-process jax.distributed run (not just a virtual mesh): two
processes x 4 CPU devices form one 8-device global mesh; the ring ICP's
ppermute/psum collectives cross the process boundary."""

import os
import subprocess
import sys


def test_two_process_distributed_ring_icp():
    worker = os.path.join(
        os.path.dirname(__file__), "helpers_multiprocess_worker.py"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert "MULTIPROC OK" in out
        assert "info=(%d, 2, 4, 8)" % pid in out
