"""Randomized executor soak: mixed operations preserve pool invariants.

A seeded random schedule of submit / step / cancel / snapshot+restore
against one executor, checking the invariants that every feature must
jointly preserve: block conservation after drain, output lengths within
request budgets, and greedy determinism of the surviving requests vs a
clean executor.
"""

import json
import random

import jax
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, max_position_embeddings=128)
    return mllama.init_random_params(cfg, jax.random.PRNGKey(0)), cfg


KW = dict(max_batch=3, max_seq_len=48, block_size=8, prefill_chunk=8,
          num_blocks=40)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_schedule_preserves_invariants(model, seed):
    params, cfg = model
    rng = random.Random(seed)
    ex = Executor(params, cfg, seed=0, **KW)
    submitted = {}      # rid -> (prompt, max_new)
    cancelled = set()

    for op in range(60):
        roll = rng.random()
        if roll < 0.35 and len(submitted) < 12:
            plen = rng.randint(1, 12)
            n = rng.randint(1, 8)
            prompt = [rng.randint(1, 120) for _ in range(plen)]
            rid = ex.submit(prompt, max_new_tokens=n)
            submitted[rid] = (prompt, n)
        elif roll < 0.45 and submitted:
            rid = rng.choice(list(submitted))
            if ex.cancel(rid):
                cancelled.add(rid)
        elif roll < 0.55 and op % 2:
            # snapshot + restore onto a FRESH executor mid-flight
            snap = json.loads(json.dumps(ex.snapshot()))
            ex = Executor(params, cfg, seed=0, **KW)
            ex.restore(snap)
        else:
            if ex.has_work:
                ex.step()
    done = ex.run()

    # every submitted request finished (or was cancelled early)
    assert set(done) == set(submitted)
    for rid, (prompt, n) in submitted.items():
        req = done[rid]
        assert req.done
        assert len(req.generated) <= n
        if rid not in cancelled:
            assert len(req.generated) == n     # no eos in random model
            assert req.prompt == prompt        # unstitched after resume

    # block conservation: all pages returned (no reuse => no cache refs)
    assert ex.bm.num_free == KW["num_blocks"] - 1

    # greedy determinism: non-cancelled outputs equal a clean run
    clean = Executor(params, cfg, seed=0, **KW)
    ids = {}
    for rid, (prompt, n) in submitted.items():
        if rid not in cancelled:
            ids[clean.submit(prompt, max_new_tokens=n)] = rid
    want = clean.run()
    matched = sum(want[c].generated == done[ids[c]].generated for c in ids)
    assert matched == len(ids), f"{matched}/{len(ids)} greedy-equal"
