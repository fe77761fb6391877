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


def _run_pair(worker: str, extra_args, marker: str, timeout: int = 300):
    """Launch two coordinated jax.distributed processes; return the two
    marker lines (one per worker) after asserting both exited 0."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    path = os.path.join(os.path.dirname(__file__), worker)
    # scrub harness/TPU env so the workers come up as plain CPU processes
    # (the axon sitecustomize would otherwise register a PJRT backend)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES")}
    procs = [
        subprocess.Popen(
            [sys.executable, path, coord, "2", str(i)] + list(extra_args),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    lines = [line for out in outs for line in out.splitlines()
             if line.startswith(marker)]
    assert len(lines) == 2, outs
    return lines


def test_two_process_mesh():
    sums = _run_pair("_multihost_worker.py", [], "CHECKSUM", timeout=240)
    assert sums[0] == sums[1], sums


def test_two_process_executor_tp():
    """The FULL paged serving stack — admission, block tables, chunked
    prefill, kernel-plane decode, bursts, readbacks — SPMD across 2 real
    processes on a tp=4 mesh (r4 VERDICT missing #2: previously only a
    sharded linear was cross-process-tested). Each worker asserts
    token-exactness vs its own single-process run and zero pool gathers;
    the parent asserts the two workers read back identical tokens (a
    divergent host would have issued different programs and deadlocked
    or split-brained the schedulers)."""
    toks = _run_pair("_multihost_exec_worker.py", ["tp"], "TOKENS")
    assert toks[0] == toks[1], toks


def test_two_process_executor_pp_tp():
    """Same, on a pp=2 x tp=2 mesh — the cross-process analogue of the
    reference's mpirun pipeline serving (mix_qwen_mpi.sh; token broadcast
    generation.py:2528-2559): stages live in DIFFERENT processes, so the
    ppermute activation hops and last-stage logits psum ride the
    inter-process transport."""
    toks = _run_pair("_multihost_exec_worker.py", ["pptp"], "TOKENS")
    assert toks[0] == toks[1], toks


def test_two_process_executor_dp():
    """r5 dp lane groups across processes: each process pair owns one
    group's pool slice + block manager; the hosts' group-aware admission
    must stay identical, and the only cross-group traffic is the
    (B,)-scalar token replication for the host readback."""
    toks = _run_pair("_multihost_exec_worker.py", ["dp"], "TOKENS")
    assert toks[0] == toks[1], toks


def test_two_process_beam_burst():
    """r5 circular beam burst (runtime/beam_pp.py) across processes on a
    pp=2 x tp=2 mesh: the top-k reorder ring, final-reorder psum and
    last-stage logits psum all ride the inter-process transport; both
    workers must produce the single-process beams exactly."""
    toks = _run_pair("_multihost_exec_worker.py", ["beams"], "TOKENS")
    assert toks[0] == toks[1], toks
