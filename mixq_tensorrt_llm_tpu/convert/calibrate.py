"""act_scales calibration: per-input-channel activation absmax capture.

TPU-native replacement of the reference's SmoothQuant-style hook capture
(MixQ/src/examples/smooth_quant_get_act.py:13-50: torch forward hooks over
512 samples of a text corpus -> per-channel running absmax saved as a .pt
dict keyed `model.layers.{i}.{module}`). Here the capture is in-graph
(models.common.forward collect_stats=True) so it runs jitted on TPU, and
the result uses the same key convention so artifacts interchange with the
reference's shipped `act_scales/*.pt` files.
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common as mcommon
from ..models.common import ModelConfig

# our fused-module stats -> reference per-module key names; fused inputs are
# shared (qkv <- q/k/v, gate_up <- gate/up) so one capture covers them all
_KEY_MAP = {
    "qkv_proj": ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
    "o_proj": ("self_attn.o_proj",),
    "gate_up_proj": ("mlp.gate_proj", "mlp.up_proj"),
    "down_proj": ("mlp.down_proj",),
}


def calibrate_act_scales(params_float: Dict, cfg: ModelConfig,
                         token_batches: Iterable[np.ndarray],
                         max_seq_len: Optional[int] = None
                         ) -> Dict[str, np.ndarray]:
    """Run float-model forwards over calibration batches, return act scales.

    params_float must be an unquantized (QuantAlgo.NONE) param pytree of the
    same architecture. Returns {"model.layers.{i}.{module}": absmax (in,)}.
    """
    assert not cfg.quant.enabled, "calibrate on the float model"

    @jax.jit
    def step(params, tokens, lens):
        b, s = tokens.shape
        cache = mcommon.init_kv_cache(cfg, b, s)
        pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
        _, _, stats = mcommon.forward(params, cfg, tokens, pos, cache, lens,
                                      collect_stats=True, full_prefill=True)
        return stats   # dict of (L, in) stacked absmax

    running: Optional[Dict[str, jnp.ndarray]] = None
    for batch in token_batches:
        batch = np.asarray(batch, np.int32)
        if batch.ndim == 1:
            batch = batch[None]
        if max_seq_len:
            batch = batch[:, :max_seq_len]
        lens = jnp.full((batch.shape[0],), batch.shape[1], jnp.int32)
        stats = step(params_float, jnp.asarray(batch), lens)
        if running is None:
            running = stats
        else:
            running = jax.tree.map(jnp.maximum, running, stats)

    assert running is not None, "no calibration batches given"
    out: Dict[str, np.ndarray] = {}
    for module, stacked in running.items():
        arr = np.asarray(stacked, np.float32)       # (L, in)
        for i in range(cfg.num_layers):
            for ref_key in _KEY_MAP[module]:
                out[f"model.layers.{i}.{ref_key}"] = arr[i]
    return out


def load_act_scales(path: str) -> Mapping[str, np.ndarray]:
    """Load an act_scales artifact (.pt torch dict or .npz)."""
    if path.endswith(".pt"):
        import torch
        d = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in d.items()}
    data = np.load(path)
    return {k: data[k] for k in data.files}


def save_act_scales(scales: Mapping[str, np.ndarray], path: str) -> None:
    assert path.endswith(".npz")
    np.savez(path, **{k: np.asarray(v, np.float32) for k, v in scales.items()})
