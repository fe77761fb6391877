"""Quantization algorithm / mode configuration.

TPU-native re-design of the reference's quant mode system
(reference: tensorrt_llm/quantization/mode.py:37-38,75,109-110,238-275 —
QuantAlgo enums `int8_mix`/`int4_mix`, MIX_PRECISION flag, from_quant_algo).

Instead of a bitfield QuantMode we use a small frozen dataclass; everything
is static config consumed at trace time, so there is no need for runtime
flag arithmetic.
"""

from __future__ import annotations

import dataclasses
import enum
import json


class QuantAlgo(str, enum.Enum):
    """Supported quantization algorithms.

    Mirrors reference QuantAlgo values relevant to MixQ
    (tensorrt_llm/quantization/mode.py:20-45): W8A16, W4A16, INT8_MIX,
    INT4_MIX, plus NONE for fp16/bf16 passthrough.
    """

    NONE = "none"
    W8A16 = "w8a16"              # weight-only int8, per-out-channel scale
    W4A16 = "w4a16"              # weight-only int4, per-out-channel scale
    W4A16_G = "w4a16_g"          # weight-only int4, per-GROUP scales
    #                              (QuantConfig.group_size rows share one
    #                              scale per out-channel — the GPTQ/AWQ-
    #                              style grouping of stock TRT-LLM
    #                              W4A16_GPTQ; true absmax/7 scaling, far
    #                              tighter than the mix path's /10 rule)
    INT8_MIX = "int8_mix"        # W8A8O16: int8 GEMM + fp16 outlier side-GEMM
    INT4_MIX = "int4_mix"        # W4A8O16 variant (scale=absmax/10, clamp [-8,7])
    FP8 = "fp8"                  # weight-only float8_e4m3 (stock TRT-LLM algo)
    INT8_LR = "int8_lr"          # W8A8 + rank-r float correction of the
    #                              weight-quantization residual — a
    #                              calibration-free alternative to the
    #                              outlier side-GEMM (MUXQ-style low-rank
    #                              decomposition, PAPERS.md; dense (in,r)
    #                              and (r,out) GEMMs replace the outlier
    #                              gather — MXU-friendly, no act_scales)

    @property
    def is_mix(self) -> bool:
        return self in (QuantAlgo.INT8_MIX, QuantAlgo.INT4_MIX)

    @property
    def is_weight_only(self) -> bool:
        return self in (QuantAlgo.W8A16, QuantAlgo.W4A16,
                        QuantAlgo.W4A16_G)

    @property
    def is_fp8(self) -> bool:
        return self == QuantAlgo.FP8

    @property
    def is_lr(self) -> bool:
        return self == QuantAlgo.INT8_LR

    @property
    def weight_bits(self) -> int:
        return {
            QuantAlgo.NONE: 16,
            QuantAlgo.W8A16: 8,
            QuantAlgo.W4A16: 4,
            QuantAlgo.W4A16_G: 4,
            QuantAlgo.INT8_MIX: 8,
            QuantAlgo.INT4_MIX: 4,
            QuantAlgo.FP8: 8,
            QuantAlgo.INT8_LR: 8,
        }[self]


class KVCacheQuantAlgo(str, enum.Enum):
    """KV-cache quantization (reference: kv_cache_quant_algo, quantize.py:267-271)."""

    NONE = "none"
    INT8 = "int8"
    FP8 = "fp8"                  # float8_e4m3 KV (stock TRT-LLM algo)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Static quantization plan for a model.

    Reference semantics (SURVEY §0 / modelopt model_config_utils.py:378-470):
      * weights: per-output-channel symmetric int8, scale = absmax/127
        (int4: scale = absmax/10, clamp [-8, 7])
      * activations: per-token dynamic symmetric int8
      * `num_outliers` input channels (ranked by calibrated activation absmax)
        are kept in fp16/bf16 and excluded from the int8 path.

    `mix_modules` / `weight_only_modules` reproduce the reference's module
    routing: the TRT path mixes only {qkv, gate, up} and leaves down_proj /
    o_proj fp16 (model_config_utils.py:408-414), while the PyTorch path mixes
    everything except down_proj which goes weight-only
    (MixQ/src/mixquant/utils/module.py:2-12). We default to the PyTorch
    routing (strictly more quantized => faster) and allow overrides.
    lm_head is never quantized (tensorrt_llm/quantization/quantize.py:312).
    """

    algo: QuantAlgo = QuantAlgo.NONE
    kv_cache: KVCacheQuantAlgo = KVCacheQuantAlgo.NONE
    num_outliers: int = 128          # TRT path: 128 static (plugin.py / model_config_utils.py:446)
    max_outliers: int = 256          # PyTorch dynamic path cap (Cache.py:12-23)
    outlier_sigma: float = 6.0       # dynamic outlier threshold (linear.py:197-223)
    dynamic_outliers: bool = False   # runtime adaptive growth (PyTorch path)
    group_size: int = 128            # rows per scale group (W4A16_G)
    # module-name suffixes routed to the mixed path vs weight-only path
    mix_modules: tuple = ("q_proj", "k_proj", "v_proj", "qkv_proj", "gate_proj",
                          "up_proj", "gate_up_proj", "o_proj")
    weight_only_modules: tuple = ("down_proj",)
    exclude_modules: tuple = ("lm_head",)

    @property
    def enabled(self) -> bool:
        return self.algo != QuantAlgo.NONE

    def module_algo(self, name: str) -> QuantAlgo:
        """Resolve the algorithm for a module by (suffix of) name."""
        if not self.enabled:
            return QuantAlgo.NONE
        short = name.rsplit(".", 1)[-1]
        if any(short == e or name.endswith(e) for e in self.exclude_modules):
            return QuantAlgo.NONE
        if self.algo.is_weight_only or self.algo.is_fp8:
            return self.algo
        # mix/lr algos: route down_proj to the matching weight-only algo
        if any(short == w or name.endswith(w) for w in self.weight_only_modules):
            return (QuantAlgo.W4A16 if self.algo == QuantAlgo.INT4_MIX
                    else QuantAlgo.W8A16)
        if any(short == m or name.endswith(m) for m in self.mix_modules):
            return self.algo
        return QuantAlgo.NONE

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["algo"] = self.algo.value
        d["kv_cache"] = self.kv_cache.value
        d["mix_modules"] = list(self.mix_modules)
        d["weight_only_modules"] = list(self.weight_only_modules)
        d["exclude_modules"] = list(self.exclude_modules)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "QuantConfig":
        d = dict(d)
        d["algo"] = QuantAlgo(d.get("algo", "none"))
        d["kv_cache"] = KVCacheQuantAlgo(d.get("kv_cache", "none"))
        for k in ("mix_modules", "weight_only_modules", "exclude_modules"):
            if k in d:
                d[k] = tuple(d[k])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "QuantConfig":
        return cls.from_dict(json.loads(s))
