"""Runtime-adaptive outlier detection (the reference's PyTorch-path MixQ).

Reference behavior (MixQ/src/mixquant/modules/linear.py:197-223 + Cache.py:
12-23): at inference time, if a per-token activation scale exceeds sigma/127
(sigma=6), newly-outlying channels are found (FindOutliers), their int8
weight rows are dequantized into an fp16 weight cache, and the outlier
index set grows up to 256 entries.

TPU re-design: shapes must be static under jit, so the outlier *capacity*
is fixed (cfg.quant.max_outliers) and the outlier *set* is data — a running
per-input-channel absmax (`chan_max`, seeded from calibration so the static
top-k are selected from step one). Each call:

  1. chan_max <- max(chan_max, absmax(x))            (running stats)
  2. dynamic fp_ind = top-cap channels with chan_max > sigma (padded -1)
  3. fp_weight = dequant(qweight[fp_ind])            (gathered per call)
  4. mixed matmul with the dynamic split

Padding with -1 is safe end-to-end: the one-hot selector column for -1 is
all zero, so the padded x_outlier columns are exact zeros and the matching
fp_weight rows multiply into nothing. The reference's "freeze after 2
stable steps" micro-optimization is intentionally dropped — monitoring is
free on TPU because it fuses into the quantize pass.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import core as qcore


class DynamicOutlierState(NamedTuple):
    chan_max: jax.Array     # (in,) f32 running activation absmax


def init_state(act_scale: jax.Array) -> DynamicOutlierState:
    """Seed from calibrated activation absmax (ones if uncalibrated)."""
    return DynamicOutlierState(chan_max=act_scale.astype(jnp.float32))


def dynamic_fp_ind(chan_max: jax.Array, cap: int, sigma: float,
                   base_k: int) -> jax.Array:
    """Select up to `cap` outlier channels: always the top `base_k` (the
    static calibrated set), plus any channel whose running absmax exceeds
    sigma. Channels failing both criteria pad as -1."""
    top_val, top_idx = jax.lax.top_k(chan_max, cap)
    rank = jnp.arange(cap)
    keep = (rank < base_k) | (top_val > sigma)
    return jnp.where(keep, top_idx, -1).astype(jnp.int32)


def dynamic_split_and_weights(
    x: jax.Array,                 # (..., in) activations
    state: DynamicOutlierState,
    qweight: jax.Array,           # (in, out) int8
    scale_col: jax.Array,         # (out,) f32
    cap: int, sigma: float, base_k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array,
           DynamicOutlierState]:
    """Returns (q_x, scale_row, x_outliers, fp_weight, new_state)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)),
                     axis=tuple(range(x.ndim - 1)))
    chan_max = jnp.maximum(state.chan_max, absmax)
    fp_ind = dynamic_fp_ind(chan_max, cap, sigma, base_k)

    # padded (-1) entries produce all-zero one-hot columns -> exact zeros
    k_in = x.shape[-1]
    iota = jnp.arange(k_in, dtype=jnp.int32)
    hit = iota[:, None] == fp_ind[None, :]                  # (in, cap)
    onehot = hit.astype(jnp.bfloat16)
    mask = (~jnp.any(hit, axis=1)).astype(x.dtype)

    x_out = jnp.dot(x.astype(jnp.bfloat16), onehot,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    q_x, scale_row = qcore.quantize_activations(x * mask)

    # dequantize the selected weight rows (row -1 clamps to row 0; its
    # contribution is zeroed by the zero x_out column)
    safe_ind = jnp.maximum(fp_ind, 0)
    fp_weight = (qweight[safe_ind].astype(jnp.float32)
                 * scale_col[None, :]).astype(jnp.bfloat16)
    return q_x, scale_row, x_out, fp_weight, DynamicOutlierState(chan_max)


def adaptive_mix_linear(x, qweight, scale_col, state: DynamicOutlierState,
                        cap: int, sigma: float, base_k: int,
                        out_dtype=jnp.bfloat16):
    """Full adaptive mixed linear: dynamic split -> mixed matmul.

    Note the dequantized fp_weight rows are *exactly* qweight*scale, so for
    channels that were never true outliers this matches the pure-int8 path
    bit-for-concept; accuracy improves only where activations genuinely
    spike (the adaptive claim of the reference).
    """
    from ..ops import ref

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    q_x, srow, x_out, fp_w, new_state = dynamic_split_and_weights(
        x2, state, qweight, scale_col, cap, sigma, base_k)
    out = ref.mixed_matmul(q_x, srow, x_out, qweight, scale_col, fp_w,
                           out_dtype=out_dtype)
    return out.reshape(*lead, -1), new_state


# ---------------------------------------------------------------------------
# model-level state (threaded through the decoder scan)
# ---------------------------------------------------------------------------

MIX_STATE_MODULES = ("qkv_proj", "o_proj", "gate_up_proj")
STATE_PREFIX = "ostate_"


def init_model_state(params, cfg) -> dict:
    """{module: chan_max (L, in)} seeded so the calibrated static outlier
    set (each layer's fp_ind) ranks above sigma from step one — the
    reference's initial fp16 outlier set (linear.py:197-223) expressed as
    state. New channels join when their running absmax crosses sigma."""
    layers = params["layers"]
    sigma = cfg.quant.outlier_sigma
    out = {}
    for mod in MIX_STATE_MODULES:
        if mod not in layers or "fp_ind" not in layers[mod]:
            continue
        fp_ind = layers[mod]["fp_ind"]               # (L, k)
        l, k = fp_ind.shape
        d_in = layers[mod]["qweight"].shape[1]
        seed = jnp.zeros((l, d_in), jnp.float32)
        seed = jax.vmap(lambda s, idx: s.at[idx].set(2.0 * sigma))(
            seed, fp_ind)
        out[mod] = seed
    return out


def merge_into_cache(layer_cache_struct: dict, ostate: dict) -> dict:
    return {**layer_cache_struct,
            **{STATE_PREFIX + k: v for k, v in ostate.items()}}


def split_from_cache(struct: dict):
    ostate = {k[len(STATE_PREFIX):]: v for k, v in struct.items()
              if k.startswith(STATE_PREFIX)}
    rest = {k: v for k, v in struct.items()
            if not k.startswith(STATE_PREFIX)}
    return rest, ostate
