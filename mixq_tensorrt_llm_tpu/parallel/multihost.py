"""Multi-host initialization helpers.

Reference parity: the mpirun launch scripts + hlapi/mpi_session.py
(mix_qwen_mpi.sh spawns one process per GPU and NCCL stitches them). On
TPU the single-controller model makes this a one-call setup:
`jax.distributed.initialize` joins the hosts, `jax.devices()` then spans
the full slice, and the same Mapping/Mesh code paths work unchanged —
collectives ride ICI within a slice and DCN across slices, chosen by XLA
from the mesh axis order (fastest-varying axes should map to ICI: put
'tp' innermost, 'dp' outermost, which Mapping.make_mesh already does).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mapping import Mapping


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join this process to a multi-host JAX runtime.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all arguments
    auto-detect; explicit values support DCN-connected CPU/GPU testing.
    Idempotent: safe to call when already initialized or single-host.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError) as e:
        # Tolerate: already initialized, or single-host where the backend
        # is already up (jax.distributed must run before any backend use —
        # do NOT probe jax.process_count() here, that boots the backend).
        msg = str(e).lower()
        if "already" in msg:
            return
        if num_processes in (None, 1):
            return
        raise


def default_mapping(tp_per_host: Optional[int] = None) -> Mapping:
    """dp across hosts, tp within a host's devices — the standard serving
    topology (weights fit one host; batch scales across hosts)."""
    local = jax.local_device_count()
    total = jax.device_count()
    tp = tp_per_host or local
    assert total % tp == 0
    return Mapping(dp=total // tp, tp=tp)


def is_primary() -> bool:
    return jax.process_index() == 0
