"""On-chip smoke for the small-q verify kernel + spec-executor round.

Checks (1) paged_verify_attention lowers through Mosaic at 7B geometry
(rows = s*Hq tile) and matches the gather reference, (2) a spec-executor
round runs end-to-end on the chip. Run when the axon tunnel is up:
    python tools/probe_smallq_tpu.py
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main():
    t0 = time.time()
    print("devices:", jax.devices(), f"({time.time() - t0:.1f}s)")

    from mixq_tensorrt_llm_tpu.ops.paged_attention import (
        paged_decode_attention, paged_verify_attention)
    from mixq_tensorrt_llm_tpu.quant import core as qcore

    # 7B geometry: Hq=32, Hkv=8 (GQA4), D=128, int8 KV pages of 128
    b, s, hq, hkv, d, nb, bs, mb = 4, 5, 32, 8, 128, 40, 128, 8
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, hq, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (nb, hkv, bs, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (nb, hkv, bs, d))
    lens = jnp.array([300, 650, 129, 1000], jnp.int32)
    table = np.zeros((b, mb), np.int32)
    nxt = 1
    for i in range(b):
        for j in range(-(-int(lens[i]) // bs)):
            table[i, j] = nxt
            nxt += 1
    qk, sk = qcore.quantize_kv(k)
    qv, sv = qcore.quantize_kv(v)

    t0 = time.time()
    out = paged_verify_attention(q, qk, qv, sk, sv, jnp.asarray(table),
                                 lens, lens - s, d ** -0.5)
    out.block_until_ready()
    print(f"verify kernel compiled+ran ({time.time() - t0:.1f}s), "
          f"out {out.shape} finite={bool(jnp.isfinite(out).all())}")

    ref = paged_verify_attention(q, qk, qv, sk, sv, jnp.asarray(table),
                                 lens, lens - s, d ** -0.5, interpret=True)
    err = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())
    print("max |kernel - interpret| =", err)
    assert err < 2e-2

    # s=1 path must still match the decode kernel bit-for-bit
    a1 = paged_decode_attention(q[:, 0], qk, qv, sk, sv,
                                jnp.asarray(table), lens, d ** -0.5)
    a2 = paged_verify_attention(q[:, :1], qk, qv, sk, sv,
                                jnp.asarray(table), lens, lens - 1,
                                d ** -0.5)
    assert bool(jnp.all(a1 == a2[:, 0]))
    print("s=1 == decode kernel: OK")

    # spec round end-to-end on chip (tiny model, real kernels)
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
    cfg = ModelConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                      num_layers=2, num_heads=8, num_kv_heads=8, head_dim=32,
                      max_position_embeddings=256)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    ex = Executor(params, cfg, max_batch=2, max_seq_len=256, block_size=64,
                  prefill_chunk=64, seed=0)
    a = ex.submit([3, 1, 4, 1, 5], max_new_tokens=12)
    t0 = time.time()
    done = ex.run_speculative(params, cfg, gamma=4)   # self-draft
    print(f"spec rounds={ex.spec_rounds} tokens={len(done[a].generated)} "
          f"({time.time() - t0:.1f}s)")
    assert len(done[a].generated) == 12

    # grouped packed-int4 kernel lowers in Mosaic at 7B geometry
    from mixq_tensorrt_llm_tpu.ops import ref as ops_ref
    from mixq_tensorrt_llm_tpu.ops.wo_matmul import wo_matmul_packed_grouped
    kk, nn, gs = 4096, 4096, 128
    w = jax.random.normal(jax.random.PRNGKey(5), (kk, nn), jnp.float32) * 0.02
    qg, sg = qcore.quantize_weight_int4_grouped(w, gs)
    packed = qcore.pack_int4(qg)
    xx = jax.random.normal(jax.random.PRNGKey(6), (4, kk), jnp.bfloat16)
    t0 = time.time()
    got = wo_matmul_packed_grouped(xx, packed, sg, gs,
                                   out_dtype=jnp.float32)
    got.block_until_ready()
    want = ops_ref.wo_matmul_grouped(xx, qg, sg, out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    print(f"w4a16_g packed kernel @4096x4096 ({time.time() - t0:.1f}s) "
          f"rel={rel:.2e}")
    assert rel < 5e-3
    print("SMALLQ TPU PROBE PASSED")


if __name__ == "__main__":
    main()
