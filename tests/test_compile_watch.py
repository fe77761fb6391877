"""No-compiles-after-warmup (r3 VERDICT next-round #4).

The reference's engine serves only precompiled programs
(builder.py:785-986); under jit the equivalent is Executor.warmup() having
enumerated every serving shape. utils/compile_watch counts XLA backend
compilations via jax.monitoring; Executor.compiles_since_warmup exposes
the delta. These tests pin both directions:

  * a mixed post-warmup workload (ragged admissions, bursts with pow2
    ladder tails, prefill lane variants) compiles ZERO new programs;
  * a deliberately-unwarmed shape (a burst rung warmup never ran) is
    DETECTED — the counter goes positive.
"""

import jax
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models.families import init_random_params
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
from mixq_tensorrt_llm_tpu.utils import compile_watch

CFG = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
           num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
           max_position_embeddings=256)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(**CFG)
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    return params, cfg


def _executor(params, cfg):
    return Executor(params, cfg, max_batch=4, max_seq_len=128,
                    block_size=8, prefill_chunk=8, prefill_lanes=2, seed=0)


def test_counter_counts(setup):
    """The monitoring hook observes a fresh compilation."""
    import jax.numpy as jnp
    before = compile_watch.compile_count()
    jax.jit(lambda x: x * 3 + 1)(jnp.ones((3, 5)))
    assert compile_watch.compile_count() > before


def test_no_compiles_after_warmup(setup):
    params, cfg = setup
    ex = _executor(params, cfg)
    assert ex.compiles_since_warmup is None   # pre-warmup: no contract yet
    assert ex.cache_loads_since_warmup is None
    ex.warmup(burst=4)
    assert ex.compiles_since_warmup == 0
    assert ex.cache_loads_since_warmup == 0

    # mixed workload: ragged prompts, staggered budgets (forces ladder
    # tail rungs), multiple admission waves through the prefill lanes
    for prompts, budgets, burst in [
        ([[1, 2, 3], [7, 8]], [5, 5], 4),
        ([[4, 5, 6, 7, 8, 9], [2], [3, 3, 3]], [7, 6, 3], 4),
        ([[9] * 10], [4], 2),
        ([[1], [2], [3], [4]], [1, 1, 1, 1], 1),
    ]:
        for p, b in zip(prompts, budgets):
            ex.submit(p, max_new_tokens=b)
        ex.run(burst=burst)
    assert ex.compiles_since_warmup == 0, \
        "a serving shape slipped past warmup's enumeration"
    # steady state must also not LOAD programs from the persistent cache
    # (the duration event conflates compile and load; both counters
    # staying 0 pins the diagnosable split — r4 VERDICT weak #5)
    assert ex.cache_loads_since_warmup == 0


def test_warmed_beam_controls_compile_nothing(setup):
    """warmup_beams(controls=...) covers the CONTROLLED beam programs:
    a served batch carrying min_new_tokens + stop_sequences within the
    warmed pow2 buckets compiles zero new programs (ADVICE r4: controls
    change the memo key, so control-free warmup alone does not cover
    them)."""
    params, cfg = setup
    ex = Executor(params, cfg, max_batch=2, max_seq_len=128, block_size=8,
                  prefill_chunk=8, seed=0)
    ex.warmup_beams(num_beams=2, burst=4, prompt_bucket=8,
                    max_new_tokens=8, eos_token_id=5,
                    controls={"min_new_tokens": 1, "stop_len": 2})
    assert ex.compiles_since_warmup == 0
    for p in ([1, 2, 3, 4, 5, 6, 7, 8], [3, 1, 4, 1, 5, 9, 2, 6]):
        ex.submit(p, max_new_tokens=8, eos_token_id=5, min_new_tokens=3,
                  stop_sequences=[[7, 7]])
    ex.run_beams(num_beams=2, burst=4)
    assert ex.compiles_since_warmup == 0, \
        "a controlled beam shape slipped past warmup_beams(controls=)"


def test_staggered_tail_rungs_are_warm(setup):
    """Regression (round 4): warmup's rung ladder used budget k+1, which
    silently skipped the k=2 burst whenever the admission step decoded a
    token before bursting; the first STAGGERED batch tail then compiled
    it mid-serving (~15 s on chip — measured 124 vs 727 gen tok/s).
    Staggered admission waves (prefill_lanes < requests) with a shared
    gen budget reproduce the small tail rungs."""
    params, cfg = setup
    ex = Executor(params, cfg, max_batch=8, max_seq_len=96, block_size=8,
                  prefill_chunk=8, prefill_lanes=2, seed=0)
    ex.warmup(burst=8)
    # every pow2 rung the tail scheduler can pick must already exist
    assert {2, 4, 8} <= set(ex._burst_fns), sorted(ex._burst_fns)
    assert ex.compiles_since_warmup == 0
    for i in range(8):
        ex.submit([1 + i] * (3 + i), max_new_tokens=24)
    ex.run(burst=8)
    assert ex.compiles_since_warmup == 0


def test_unwarmed_shape_is_detected(setup):
    params, cfg = setup
    ex = _executor(params, cfg)
    ex.warmup(burst=1)          # decode-only warmup: burst rungs NOT warm
    assert ex.compiles_since_warmup == 0
    ex.submit([1, 2, 3], max_new_tokens=9)
    ex.run(burst=4)             # k=4 burst program was never compiled
    assert ex.compiles_since_warmup > 0
