"""Two-process jax.distributed test on local CPU.

Reference parity: the mpirun launch path (mix_qwen_mpi.sh + NCCL) — here
jax.distributed.initialize joins two local processes, each contributing 2
virtual CPU devices, into one 4-device mesh; a TP-sharded linear and a
cross-host gather must agree with the single-process reference on both
workers. This is the closest a single machine gets to validating
parallel/multihost.py (real pods auto-detect the same code path).
"""

import os
import socket
import subprocess
import sys



def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    # scrub harness/TPU env so the workers come up as plain CPU processes
    # (the axon sitecustomize would otherwise register a PJRT backend)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES")}
    procs = [
        subprocess.Popen([sys.executable, worker, coord, "2", str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    sums = [line for out in outs for line in out.splitlines()
            if line.startswith("CHECKSUM")]
    assert len(sums) == 2 and sums[0] == sums[1], sums
