"""Bisect the paged decode step: where do the non-linear, non-attention
milliseconds go? Times the 2-layer 7B-geometry step with pieces stubbed:

  full        : forward_paged as-is
  no_attn     : _attention_paged replaced by identity (keeps linears, norms,
                rope, embed, lm_head, argmax)
  no_linear   : dispatch.linear/norm_linear replaced by slice-identity
                (keeps attention + glue)

Slope-timed (RTT cancels).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.models import (ModelConfig, llama as mllama,
                                          common as mcommon)
from mixq_tensorrt_llm_tpu.ops import dispatch
from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                         KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv

B, BS, CTX = 16, 128, 1024
MB = CTX // BS + 1
NB = B * MB + 1
NL = 2


def slope(run, args, lo=16, hi=64):
    fl, fh = run(lo), run(hi)
    float(fl(*args)); float(fh(*args))
    t_lo = min((_t(fl, args) for _ in range(2)))
    t_hi = min((_t(fh, args) for _ in range(2)))
    return (t_hi - t_lo) / (hi - lo)


def _t(run, args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def build(cfg, params, state, table):
    tok0 = jnp.ones((B, 1), jnp.int32)
    lens0 = jnp.full((B,), CTX, jnp.int32)

    def mk(n):
        @jax.jit
        def run(params, tokens, state, lens):
            def body(i, carry):
                tokens, state, lens, acc = carry
                pos = lens[:, None].astype(jnp.int32)
                logits, state = mcommon.forward_paged(
                    params, cfg, tokens, pos, state, table, lens + 1)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt[:, None], state, lens + 1, acc + logits[0, 0, 0])
            out = jax.lax.fori_loop(0, n, body,
                                    (tokens, state, lens, jnp.float32(0)))
            return out[3]
        return run
    return mk, (params, tok0, state, lens0)


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=NL,
                      num_heads=32, num_kv_heads=32, head_dim=128,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=128,
                                        kv_cache=KVCacheQuantAlgo.INT8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    state = init_paged_kv(cfg, NB, BS)
    table = jnp.asarray(
        np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))

    mk, args = build(cfg, params, state, table)
    t = slope(mk, args)
    print(f"full      : {t*1e3:8.3f} ms/step", flush=True)

    orig_attn = mcommon._attention_paged

    def stub_attn(cfg, q, new_k, new_v, layer_caches, *a, **k):
        return q, layer_caches
    mcommon._attention_paged = stub_attn
    mk, args = build(cfg, params, state, table)
    t = slope(mk, args)
    print(f"no_attn   : {t*1e3:8.3f} ms/step", flush=True)
    mcommon._attention_paged = orig_attn

    orig_lin, orig_nl = dispatch.linear, dispatch.norm_linear

    def stub_linear(p, x, algo, **kw):
        n_out = (p["scale_col"].shape[-1] if "scale_col" in p
                 else p["w"].shape[-1])
        h = x.shape[-1]
        reps = -(-n_out // h)
        return (jnp.tile(x, (1,) * (x.ndim - 1) + (reps,))[..., :n_out]
                * 1e-3).astype(x.dtype)

    def stub_norm_linear(p, x, algo, nw, eps=1e-6):
        return stub_linear(p, x, algo)
    dispatch.linear = stub_linear
    dispatch.norm_linear = stub_norm_linear
    mk, args = build(cfg, params, state, table)
    t = slope(mk, args)
    print(f"no_linear : {t*1e3:8.3f} ms/step", flush=True)
    dispatch.linear, dispatch.norm_linear = orig_lin, orig_nl
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
