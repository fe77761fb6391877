"""Adaptive (runtime) outlier detection tests — the PyTorch-path MixQ
behavior re-designed for static shapes (quant/dynamic.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.quant.dynamic import (DynamicOutlierState,
                                                 adaptive_mix_linear,
                                                 dynamic_fp_ind, init_state)


def rand(key, *shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


class TestDynamicFpInd:
    def test_base_set_always_selected(self):
        chan_max = jnp.asarray(np.linspace(1.0, 0.1, 32), jnp.float32)
        ind = dynamic_fp_ind(chan_max, cap=8, sigma=6.0, base_k=4)
        got = np.asarray(ind)
        np.testing.assert_array_equal(got[:4], [0, 1, 2, 3])
        assert (got[4:] == -1).all()   # nothing exceeds sigma

    def test_spikes_grow_the_set(self):
        chan_max = jnp.ones((32,)).at[17].set(50.0).at[23].set(10.0)
        ind = dynamic_fp_ind(chan_max, cap=8, sigma=6.0, base_k=2)
        got = np.asarray(ind)
        assert 17 in got and 23 in got
        assert (got != -1).sum() == 2  # spikes are also the top-2/base set

    def test_cap_respected(self):
        chan_max = jnp.full((64,), 100.0)
        ind = dynamic_fp_ind(chan_max, cap=16, sigma=6.0, base_k=4)
        assert np.asarray(ind).shape == (16,)
        assert (np.asarray(ind) != -1).all()


class TestAdaptiveLinear:
    def test_quiet_activations_match_static_path(self):
        k_in, n = 256, 128
        w = rand(0, k_in, n, scale=0.05)
        acts = jnp.abs(rand(1, k_in)) + 0.1
        art = qcore.make_mix_artifact(w, acts, num_outliers=16)
        state = init_state(acts)
        x = rand(2, 32, k_in)  # no outliers beyond calibration
        got, new_state = adaptive_mix_linear(
            x, art.qweight, art.scale_col, state, cap=32, sigma=6.0,
            base_k=16, out_dtype=jnp.float32)
        want = jnp.dot(x, w)
        rel = np.linalg.norm(np.asarray(got - want)) / \
            np.linalg.norm(np.asarray(want))
        assert rel < 0.03, rel

    def test_runtime_spike_recovers_accuracy(self):
        """A channel that spikes only at runtime (not in calibration) wrecks
        the static path but is absorbed by the adaptive one."""
        k_in, n = 256, 128
        w = rand(3, k_in, n, scale=0.05)
        acts = jnp.abs(rand(4, k_in)) + 0.1       # channel 200 NOT calibrated
        art = qcore.make_mix_artifact(w, acts, num_outliers=8)
        spike = 200
        assert spike not in np.asarray(art.fp_ind)

        x = rand(5, 32, k_in)
        x = x.at[:, spike].mul(500.0)              # runtime-only outlier
        want = jnp.dot(x, w)

        # static path (no adaptation)
        from mixq_tensorrt_llm_tpu.ops import ref
        static = ref.mix_linear(x, art.qweight, art.scale_col, art.fp_ind,
                                art.fp_weight, out_dtype=jnp.float32)
        # adaptive path
        got, new_state = adaptive_mix_linear(
            x, art.qweight, art.scale_col, init_state(acts), cap=32,
            sigma=6.0, base_k=8, out_dtype=jnp.float32)

        rel_static = np.linalg.norm(np.asarray(static - want)) / \
            np.linalg.norm(np.asarray(want))
        rel_adaptive = np.linalg.norm(np.asarray(got - want)) / \
            np.linalg.norm(np.asarray(want))
        assert rel_adaptive < 0.05, rel_adaptive
        assert rel_static > 3 * rel_adaptive
        # the spike is now tracked for future calls
        assert float(new_state.chan_max[spike]) > 6.0

    def test_state_is_monotone_and_persistent(self):
        k_in, n = 128, 64
        w = rand(6, k_in, n, scale=0.05)
        art = qcore.make_mix_artifact(w, jnp.ones((k_in,)), 4)
        state = init_state(jnp.ones((k_in,)))
        x1 = rand(7, 8, k_in).at[:, 50].mul(100.0)
        _, state1 = adaptive_mix_linear(x1, art.qweight, art.scale_col,
                                        state, 16, 6.0, 4)
        x2 = rand(8, 8, k_in)  # quiet batch
        _, state2 = adaptive_mix_linear(x2, art.qweight, art.scale_col,
                                        state1, 16, 6.0, 4)
        # the channel-50 spike persists through quiet batches
        assert float(state2.chan_max[50]) >= float(state1.chan_max[50]) > 6.0
        assert (np.asarray(state2.chan_max) >=
                np.asarray(state1.chan_max) - 1e-6).all()
