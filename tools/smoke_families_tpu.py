"""On-chip smoke for the non-llama model families.

Runs a small-geometry forward + a 3-step greedy decode for one arch per
structural class (LayerNorm+learned-pos OPT, parallel+partial-rotary Phi,
ALiBi BLOOM, MQA GPT-BigCode, Gemma scaled-embed) on the real TPU —
catches Mosaic/XLA lowering issues the CPU suite can't see.

Usage: python tools/smoke_families_tpu.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.models import (ModelConfig, init_kv_cache,  # noqa
                                          forward, registry)
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig  # noqa

COMMON = dict(vocab_size=1024, hidden_size=256, intermediate_size=512,
              num_layers=2, num_heads=8, num_kv_heads=8, head_dim=32,
              max_position_embeddings=128,
              quant=QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=16))

ARCHS = {
    "opt": dict(norm_type="layernorm", pos_embedding="learned",
                learned_pos_offset=2, mlp_type="dense", hidden_act="relu",
                qkv_bias=True, attn_out_bias=True, mlp_bias=True,
                tie_word_embeddings=True),
    "phi": dict(norm_type="layernorm", rotary_dim=16, parallel_blocks=True,
                shared_block_norm=True, mlp_type="dense",
                hidden_act="gelu_new", qkv_bias=True, attn_out_bias=True,
                mlp_bias=True, lm_head_bias=True),
    "bloom": dict(norm_type="layernorm", pos_embedding="alibi",
                  embed_norm=True, mlp_type="dense", hidden_act="gelu_tanh",
                  qkv_bias=True, attn_out_bias=True, mlp_bias=True,
                  tie_word_embeddings=True),
    "gpt_bigcode": dict(norm_type="layernorm", pos_embedding="learned",
                        mlp_type="dense", hidden_act="gelu_tanh",
                        num_kv_heads=1, qkv_bias=True, attn_out_bias=True,
                        mlp_bias=True, tie_word_embeddings=True),
    "gemma": dict(hidden_act="gelu_tanh", embed_scale=16.0,
                  tie_word_embeddings=True, num_kv_heads=2),
}


def main():
    b, s, max_len = 2, 16, 32
    for arch, kw in ARCHS.items():
        cfg = ModelConfig(arch=arch, **{**COMMON, **kw})
        params = registry.init_random_params(cfg, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                    cfg.vocab_size, dtype=jnp.int32)
        pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
        cache = init_kv_cache(cfg, b, max_len)
        lens = jnp.full((b,), s, jnp.int32)
        t0 = time.time()
        logits, cache = jax.jit(
            lambda p, t, po, c, l: forward(p, cfg, t, po, c, l,
                                           full_prefill=True)
        )(params, tokens, pos, cache, lens)
        nxt = jnp.argmax(logits[:, -1], -1)
        for step in range(3):
            lg, cache = forward(params, cfg, nxt[:, None],
                                jnp.full((b, 1), s + step, jnp.int32),
                                cache, jnp.full((b,), s + step + 1,
                                                jnp.int32))
            nxt = jnp.argmax(lg[:, 0], -1)
        val = np.asarray(nxt)
        assert np.isfinite(np.asarray(lg, np.float32)).all(), arch
        print(f"{arch}: ok ({time.time()-t0:.0f}s, last tokens {val})",
              flush=True)
    print("ALL FAMILIES SMOKE OK")


if __name__ == "__main__":
    main()
