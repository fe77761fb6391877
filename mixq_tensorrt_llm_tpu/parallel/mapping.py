"""Parallelism topology: Mapping -> jax.sharding.Mesh.

TPU-native replacement for the reference's Mapping (tensorrt_llm/mapping.py:
94-241 — TP×PP×CP world with rank-group math) and its NCCL/MPI machinery:
on TPU the topology is a named device mesh and all communication is GSPMD
collectives inserted by XLA, so rank-group bookkeeping disappears. Axis
names follow the scaling-book convention:

  dp — data/batch parallel (across slices or within)
  pp — pipeline stages (layer partition)
  tp — tensor parallel (the reference's NCCL allreduce groups)
  sp — sequence/context parallel (reference 'cp', topology-only there)
  ep — expert parallel (MoE; reserved)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


AXIS_ORDER = ("dp", "pp", "sp", "tp")


@dataclasses.dataclass(frozen=True)
class Mapping:
    dp: int = 1
    pp: int = 1
    sp: int = 1
    tp: int = 1
    ep: int = 1   # nested inside tp for MoE (reference mapping.py:102-103)

    @property
    def world_size(self) -> int:
        return self.dp * self.pp * self.sp * self.tp

    def __post_init__(self):
        if self.ep > 1 and self.tp % self.ep != 0:
            raise ValueError(f"ep={self.ep} must divide tp={self.tp}")

    def make_mesh(self, devices: Optional[Sequence] = None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < self.world_size:
            raise ValueError(
                f"need {self.world_size} devices, have {len(devices)}")
        devices = devices[: self.world_size]
        arr = np.array(devices).reshape(self.dp, self.pp, self.sp, self.tp)
        return Mesh(arr, AXIS_ORDER)

    @classmethod
    def for_devices(cls, n: int, tp: Optional[int] = None) -> "Mapping":
        """Default topology for n devices: fill tp up to 8, rest dp."""
        if tp is None:
            tp = math.gcd(n, 8) if n % 2 == 0 else 1
        assert n % tp == 0
        return cls(dp=n // tp, tp=tp)
