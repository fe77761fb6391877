"""Prefill attention kernel shootout on the real chip: stock flash (current,
512 blocks) vs splash attention at the 7B headline geometry (B16 H32 S512
D128 causal bf16). Slope-timed (two iteration counts, RTT cancels).

Prefill spends ~200 ms of its 715 ms step in attention at ~130 T Mosaic
ceiling; a faster kernel is worth ~10% end-to-end.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

B, H, S, D = 16, 32, 512, 128
SCALE = D ** -0.5


def timed(fn, x, lo=32, hi=128):
    """fn: x -> x-shaped output; chain via carry. Returns us/iter."""
    @functools.partial(jax.jit, static_argnames="n")
    def chain(x, n):
        def body(i, x):
            return fn(x)
        return jax.lax.fori_loop(0, n, body, x)

    r = float(chain(x, lo)[0, 0, 0, 0])      # warm + sync
    t0 = time.perf_counter(); r += float(chain(x, lo)[0, 0, 0, 0])
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); r += float(chain(x, hi)[0, 0, 0, 0])
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (hi - lo) * 1e6


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes)
    bs_cfg = BlockSizes(
        block_q=512, block_k_major=512, block_k=512, block_b=1,
        block_q_major_dkv=512, block_k_major_dkv=512, block_k_dkv=512,
        block_q_dkv=512, block_k_major_dq=512, block_k_dq=512,
        block_q_dq=512)

    def flash(x):
        o = flash_attention(x, x, x, causal=True, sm_scale=SCALE,
                            block_sizes=bs_cfg)
        return o.astype(x.dtype)

    print(f"flash 512        {timed(flash, q):8.1f} us", flush=True)

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)
    mask = sm.MultiHeadMask([sm.CausalMask((S, S)) for _ in range(H)])

    for blk in (None, 512):
        kw = {}
        name = "default"
        if blk:
            kw["block_sizes"] = sk.BlockSizes(
                block_q=blk, block_kv=blk, block_kv_compute=blk)
            name = str(blk)
        kernel = sk.make_splash_mha(mask=mask, head_shards=1,
                                    q_seq_shards=1, **kw)

        def splash(x):
            o = jax.vmap(kernel)((x * SCALE).astype(x.dtype), x, x)
            return o.astype(x.dtype)

        try:
            print(f"splash {name:9s} {timed(splash, q):8.1f} us", flush=True)
        except Exception as e:
            print(f"splash {name} failed: {str(e)[:200]}", file=sys.stderr,
                  flush=True)


def xla_paths():
    """Plain XLA attention candidates at the same geometry."""
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    neg = jnp.finfo(jnp.float32).min

    def einsum_f32(x):
        logits = jnp.einsum("bhqd,bhkd->bhqk", x.astype(jnp.float32) * SCALE,
                            x.astype(jnp.float32))
        mask = jnp.tril(jnp.ones((S, S), bool))
        logits = jnp.where(mask, logits, neg)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, x.astype(jnp.float32)
                          ).astype(x.dtype)

    def einsum_bf16(x):
        logits = jnp.einsum("bhqd,bhkd->bhqk", x * jnp.bfloat16(SCALE), x,
                            preferred_element_type=jnp.float32)
        mask = jnp.tril(jnp.ones((S, S), bool))
        logits = jnp.where(mask, logits, neg)
        p = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", p, x,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def cudnn_style_dot(x):
        return jax.nn.dot_product_attention(
            x.transpose(0, 2, 1, 3), x.transpose(0, 2, 1, 3),
            x.transpose(0, 2, 1, 3), is_causal=True, scale=SCALE
        ).transpose(0, 2, 1, 3)

    print(f"xla einsum f32   {timed(einsum_f32, q):8.1f} us", flush=True)
    print(f"xla einsum bf16  {timed(einsum_bf16, q):8.1f} us", flush=True)
    try:
        print(f"jax.nn.dpa       {timed(cudnn_style_dot, q):8.1f} us",
              flush=True)
    except Exception as e:
        print(f"jax.nn.dpa failed: {str(e)[:150]}", file=sys.stderr)


if __name__ == "__main__":
    xla_paths()
    main()
