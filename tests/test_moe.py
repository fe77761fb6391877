"""MoE (Mixtral) tests: router semantics, per-token-loop parity, HF
conversion, end-to-end generation, checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import (ModelConfig, forward,
                                          init_kv_cache, llama as mllama)
from mixq_tensorrt_llm_tpu.models.moe import (moe_mlp,
                                              quantize_expert_linear,
                                              router_probs)
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig


def moe_cfg(**kw):
    base = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                max_position_embeddings=64, num_experts=4, top_k_experts=2)
    base.update(kw)
    return ModelConfig(**base)


class TestRouter:
    def test_topk_renormalized(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
        rw = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        w = router_probs(x, rw, top_k=2)
        w = np.asarray(w)
        assert ((w > 0).sum(-1) == 2).all()        # exactly top-2 kept
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


class TestMoEBlock:
    def test_matches_per_token_loop(self):
        """Dense-dispatch einsum MoE == explicit per-token expert mixing."""
        cfg = moe_cfg()
        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 4)
        h, i, e = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
        gu = jax.random.normal(ks[0], (e, h, 2 * i)) * 0.05
        dn = jax.random.normal(ks[1], (e, i, h)) * 0.05
        rw = jax.random.normal(ks[2], (h, e))
        params = {"router": {"w": rw.astype(jnp.bfloat16)},
                  "gate_up": quantize_expert_linear(gu, QuantAlgo.NONE),
                  "down": quantize_expert_linear(dn, QuantAlgo.NONE)}
        x = jax.random.normal(ks[3], (1, 5, h)).astype(jnp.bfloat16)

        got = np.asarray(moe_mlp(cfg, params, x), np.float32)

        weights = np.asarray(router_probs(x, params["router"]["w"], 2))
        want = np.zeros((1, 5, h), np.float32)
        xb = np.asarray(x, np.float32)
        gu16 = np.asarray(gu.astype(jnp.bfloat16), np.float32)
        dn16 = np.asarray(dn.astype(jnp.bfloat16), np.float32)
        for t in range(5):
            acc = np.zeros((h,), np.float32)
            for ee in range(e):
                if weights[0, t, ee] > 0:
                    z = xb[0, t] @ gu16[ee]
                    g, u = z[:i], z[i:]
                    act = g / (1 + np.exp(-g)) * u
                    acc += weights[0, t, ee] * (act @ dn16[ee])
            want[0, t] = acc
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)

    def test_quantized_close_to_float(self):
        cfg = moe_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
        key = jax.random.PRNGKey(3)
        ks = jax.random.split(key, 4)
        h, i, e = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
        gu = jax.random.normal(ks[0], (e, h, 2 * i)) * 0.05
        dn = jax.random.normal(ks[1], (e, i, h)) * 0.05
        rw = jax.random.normal(ks[2], (h, e))
        x = jax.random.normal(ks[3], (2, 4, h)).astype(jnp.bfloat16)

        pf = {"router": {"w": rw.astype(jnp.bfloat16)},
              "gate_up": quantize_expert_linear(gu, QuantAlgo.NONE),
              "down": quantize_expert_linear(dn, QuantAlgo.NONE)}
        pq = {"router": {"w": rw.astype(jnp.bfloat16)},
              "gate_up": quantize_expert_linear(gu, QuantAlgo.W8A16),
              "down": quantize_expert_linear(dn, QuantAlgo.W8A16)}
        yf = np.asarray(moe_mlp(moe_cfg(), pf, x), np.float32)
        yq = np.asarray(moe_mlp(cfg, pq, x), np.float32)
        rel = np.linalg.norm(yq - yf) / np.linalg.norm(yf)
        assert rel < 0.05, rel


class TestMoEModel:
    def test_e2e_generation(self):
        cfg = moe_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(4))
        assert "moe" in params["layers"]
        assert params["layers"]["moe"]["gate_up"]["qweight"].shape == \
            (2, 4, 64, 192)   # (L, E, H, 2I)

        from mixq_tensorrt_llm_tpu.runtime import GenerationSession
        sess = GenerationSession(params, cfg, max_seq_len=32,
                                 prefill_buckets=(8,))
        a = sess.generate([[1, 2, 3]], 5)
        b = sess.generate([[1, 2, 3]], 5)
        assert a.sequences == b.sequences
        assert len(a.sequences[0]) == 8

    def test_checkpoint_roundtrip(self, tmp_path):
        from mixq_tensorrt_llm_tpu.convert import (load_checkpoint,
                                                   save_checkpoint)
        cfg = moe_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(5))
        save_checkpoint(str(tmp_path / "moe"), params, cfg)
        back, cfg2 = load_checkpoint(str(tmp_path / "moe"))
        assert cfg2.num_experts == 4
        toks = jnp.array([[1, 2, 3]], jnp.int32)
        la, _ = forward(params, cfg, toks, jnp.arange(3)[None],
                        init_kv_cache(cfg, 1, 8), jnp.array([3], jnp.int32))
        lb, _ = forward(back, cfg2, toks, jnp.arange(3)[None],
                        init_kv_cache(cfg2, 1, 8), jnp.array([3], jnp.int32))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestMixtralHF:
    def test_hf_conversion_and_parity(self):
        torch = pytest.importorskip("torch")
        from transformers import MixtralConfig, MixtralForCausalLM
        hf_cfg = MixtralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            sliding_window=None, attn_implementation="eager")
        torch.manual_seed(0)
        model = MixtralForCausalLM(hf_cfg).eval().float()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

        cfg = mllama.config_from_hf(hf_cfg)
        assert cfg.arch == "mixtral" and cfg.num_experts == 4
        params = mllama.params_from_hf(cfg, sd)

        tokens = np.array([[3, 17, 100, 5, 90]], np.int32)
        with torch.no_grad():
            hf_logits = model(torch.tensor(tokens, dtype=torch.long)
                              ).logits.numpy()
        logits, _ = forward(params, cfg, jnp.asarray(tokens),
                            jnp.arange(5)[None], init_kv_cache(cfg, 1, 8),
                            jnp.array([5], jnp.int32))
        got = np.asarray(logits)
        assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.9
        np.testing.assert_allclose(got, hf_logits, rtol=0.15, atol=0.2)


class TestMoEExpertParallel:
    def test_ep_sharded_forward_matches(self):
        """Experts sharded over the tp axis (MoE-EP) give the same logits."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from jax.sharding import NamedSharding
        from mixq_tensorrt_llm_tpu.parallel import Mapping, param_specs

        cfg = moe_cfg(num_kv_heads=2,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(7))
        toks = jnp.array([[1, 2, 3, 4]], jnp.int32)
        pos = jnp.arange(4)[None]
        lens = jnp.array([4], jnp.int32)
        want, _ = forward(params, cfg, toks, pos, init_kv_cache(cfg, 1, 8),
                          lens)

        mapping = Mapping(tp=4)   # kv heads (2) not sharded here: ep-only
        mesh = mapping.make_mesh(jax.devices()[:4])
        specs = param_specs(params)
        # shard ONLY the moe experts for this test (attention stays local)
        sharded = jax.tree.map(lambda x: x, params)
        sharded["layers"]["moe"] = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params["layers"]["moe"], specs["layers"]["moe"])
        with jax.set_mesh(mesh):
            got, _ = jax.jit(
                lambda p: forward(p, cfg, toks, pos,
                                  init_kv_cache(cfg, 1, 8), lens))(sharded)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-2, atol=3e-2)


def _rand_moe_params(cfg, key):
    ks = jax.random.split(key, 3)
    h, i, e = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
    return {
        "router": {"w": (jax.random.normal(ks[2], (h, e))
                         .astype(jnp.bfloat16))},
        "gate_up": {"w": (jax.random.normal(ks[0], (e, h, 2 * i)) * 0.05
                          ).astype(jnp.bfloat16)},
        "down": {"w": (jax.random.normal(ks[1], (e, i, h)) * 0.05
                       ).astype(jnp.bfloat16)},
    }


class TestRaggedDispatch:
    def test_ragged_matches_dense(self):
        """ragged_dot grouped dispatch == dense masked dispatch (same
        routing, same math; k/E of the FLOPs)."""
        cfg = moe_cfg()
        params = _rand_moe_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.hidden_size),
                              jnp.bfloat16)
        dense = np.asarray(moe_mlp(cfg, params, x, ragged=False), np.float32)
        ragged = np.asarray(moe_mlp(cfg, params, x, ragged=True), np.float32)
        np.testing.assert_allclose(ragged, dense, rtol=5e-2, atol=5e-2)

    def test_ragged_under_jit(self):
        cfg = moe_cfg()
        params = _rand_moe_params(cfg, jax.random.PRNGKey(2))
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, cfg.hidden_size),
                              jnp.bfloat16)

        @jax.jit
        def f(p, x):
            return moe_mlp(cfg, p, x, ragged=True)
        out = f(params, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out, np.float32)).all()


def test_expert_parallel_ragged_matches_dense():
    """shard_map ragged EP over a 4-way mesh == single-device dense MoE:
    each shard only runs its local experts over its routed pairs, the
    psum combine restores the full mixture."""
    import numpy as np
    from jax.sharding import Mesh
    from mixq_tensorrt_llm_tpu.models import ModelConfig
    from mixq_tensorrt_llm_tpu.models import moe as moe_mod
    from mixq_tensorrt_llm_tpu.parallel import expert as ep

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_layers=1, num_heads=4, num_kv_heads=4, head_dim=8,
                      num_experts=8, top_k_experts=2)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    moe_params = {
        "router": {"w": jax.random.normal(ks[0], (32, 8)) * 0.3},
        "gate_up": {"w": jax.random.normal(ks[1], (8, 32, 96)) * 0.05},
        "down": {"w": jax.random.normal(ks[2], (8, 48, 32)) * 0.05},
    }
    x = jax.random.normal(ks[3], (2, 6, 32), jnp.float32)

    want = moe_mod._moe_mlp_dense(cfg, moe_params, x)
    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    got = ep.moe_mlp_ep(cfg, moe_params, x, mesh)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)

    # the trace-time switch routes moe_mlp through the EP path
    with ep.use_expert_parallel(mesh):
        got2 = moe_mod.moe_mlp(cfg, moe_params, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_w4a16_g_experts_grouped_scales():
    """Expert weights quantized w4a16_g carry per-expert group scales and
    the MoE forward consumes them (tighter than per-channel int4)."""
    cfg = moe_cfg(quant=QuantConfig(algo=QuantAlgo.W4A16_G, group_size=32))
    key = jax.random.PRNGKey(5)
    e, h, i = 4, 64, 96
    w = jax.random.normal(key, (e, h, 2 * i), jnp.float32) \
        * jnp.logspace(-2, 0, h)[None, :, None]
    p_g = quantize_expert_linear(w, QuantAlgo.W4A16_G, 32)
    assert p_g["scale_g"].shape == (e, h // 32, 2 * i)
    p_c = quantize_expert_linear(w, QuantAlgo.W4A16)
    from mixq_tensorrt_llm_tpu.models.moe import _dequant_stack
    err_g = float(jnp.linalg.norm(
        _dequant_stack(p_g).astype(jnp.float32) - w))
    err_c = float(jnp.linalg.norm(
        _dequant_stack(p_c).astype(jnp.float32) - w))
    assert err_g < err_c, (err_g, err_c)

    # end-to-end: MoE model generates under w4a16_g
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    assert "scale_g" in jax.tree.leaves(
        params["layers"]["moe"]["gate_up"], is_leaf=lambda x: False) \
        or "scale_g" in params["layers"]["moe"]["gate_up"]
    from mixq_tensorrt_llm_tpu.runtime import GenerationSession
    sess = GenerationSession(params, cfg, max_seq_len=24,
                             prefill_buckets=(8,))
    out = sess.generate([[1, 2, 3]], 4).sequences[0]
    assert len(out) == 7
