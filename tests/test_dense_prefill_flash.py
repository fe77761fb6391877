"""Dense-prefill flash routing (round-1 VERDICT weak items 4/5): GQA and
sliding-window prompts go through the paged prefill kernel via a page view
of k/v — no jnp.repeat of kv heads, window masked in-kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.ops import ref
from mixq_tensorrt_llm_tpu.ops.attention import (_flash_prefill_page_view,
                                                 causal_self_attention)


def dense_reference(q, k, v, scale, window=0, sink=0):
    s = q.shape[1]
    idx = np.arange(s)
    mask = idx[None, :] <= idx[:, None]
    if window:
        mask &= (idx[None, :] > idx[:, None] - window) | (idx[None, :] < sink)
    return ref.attention(q, k, v, mask=jnp.asarray(mask)[None, None],
                         scale=scale)


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2), (4, 1)])
def test_page_view_gqa_parity(hq, hkv):
    b, s, d = 2, 256, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, hq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, hkv, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, hkv, d),
                          jnp.float32)
    scale = d ** -0.5
    want = dense_reference(q, k, v, scale)
    got = _flash_prefill_page_view(q, k, v, scale, 0, 0)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("window,sink", [(64, 0), (64, 16), (128, 4)])
def test_page_view_window_parity(window, sink):
    b, s, hq, hkv, d = 1, 256, 4, 2, 64
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, s, hq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, hkv, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, hkv, d),
                          jnp.float32)
    scale = d ** -0.5
    want = dense_reference(q, k, v, scale, window=window, sink=sink)
    got = _flash_prefill_page_view(q, k, v, scale, window, sink)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2,
                               err_msg=f"w={window} s={sink}")


def test_causal_self_attention_window_fallback():
    """The einsum fallback (small/odd shapes) masks the window too."""
    b, s, h, d = 1, 48, 2, 32
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d),
                          jnp.float32)
    scale = d ** -0.5
    want = dense_reference(q, k, v, scale, window=16, sink=4)
    got = causal_self_attention(q, k, v, scale, window=16, sink=4)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
