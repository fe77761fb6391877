"""Flash-decoding page split (r2 VERDICT missing #3 / next-round item 9).

paged_decode_attention_split divides each lane's page list across
kv_splits independent grid rows (the kernel's PARALLEL axis) and combines
the partials with the exact online-softmax merge — the reference's
--multi_block_mode for long-context decode. These tests pin numerical
parity with the serial page scan across int8/bf16 KV, ragged lengths,
non-dividing split counts, and windows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixq_tensorrt_llm_tpu.ops.paged_attention import (
    paged_decode_attention, paged_decode_attention_split)


def _setup(quantized, b=3, hq=4, hkv=2, d=16, nb=24, bs=8, mb=8, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, hq, d), jnp.float32).astype(jnp.bfloat16)
    if quantized:
        kp = jax.random.randint(ks[1], (nb, hkv, bs, d), -127, 128, jnp.int8)
        vp = jax.random.randint(ks[2], (nb, hkv, bs, d), -127, 128, jnp.int8)
        ksc = jax.random.uniform(ks[3], (nb, hkv, bs), jnp.float32,
                                 0.005, 0.02)
        vsc = ksc * 0.7
    else:
        kp = jax.random.normal(ks[1], (nb, hkv, bs, d), jnp.float32
                               ).astype(jnp.bfloat16)
        vp = jax.random.normal(ks[2], (nb, hkv, bs, d), jnp.float32
                               ).astype(jnp.bfloat16)
        ksc = vsc = None
    rng = np.random.default_rng(seed)
    table = np.zeros((b, mb), np.int32)
    for i in range(b):
        table[i] = rng.permutation(nb)[:mb]
    lens = jnp.asarray([mb * bs, 3, 2 * bs + 5][:b], jnp.int32)
    return q, kp, vp, ksc, vsc, jnp.asarray(table), lens


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("splits", [2, 3, 4])
def test_split_matches_serial(quantized, splits):
    q, kp, vp, ksc, vsc, table, lens = _setup(quantized)
    ref = paged_decode_attention(q, kp, vp, ksc, vsc, table, lens,
                                 scale=0.125)
    got = paged_decode_attention_split(q, kp, vp, ksc, vsc, table, lens,
                                       scale=0.125, kv_splits=splits)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_split_windowed():
    q, kp, vp, ksc, vsc, table, lens = _setup(False)
    ref = paged_decode_attention(q, kp, vp, ksc, vsc, table, lens,
                                 scale=0.125, window=10, sink=2)
    got = paged_decode_attention_split(q, kp, vp, ksc, vsc, table, lens,
                                       scale=0.125, window=10, sink=2,
                                       kv_splits=2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_split_routed_in_executor(monkeypatch):
    """MIXQ_KV_SPLITS routes executor decode through the split kernel with
    identical greedy outputs."""
    from mixq_tensorrt_llm_tpu.models import ModelConfig
    from mixq_tensorrt_llm_tpu.models.families import init_random_params
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
    cfg = ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=96,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128)
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    prompts = [[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5], [2, 7]]
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")

    def run():
        ex = Executor(params, cfg, max_batch=2, max_seq_len=64,
                      block_size=8, prefill_chunk=8, seed=0)
        ids = [ex.submit(p, max_new_tokens=6) for p in prompts]
        return [ex.run()[r].generated for r in ids]

    want = run()
    monkeypatch.setenv("MIXQ_KV_SPLITS", "2")
    got = run()
    assert got == want
