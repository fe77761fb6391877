"""Executor snapshot/restore: crash-resume serving.

SURVEY §5 notes the reference has no failure recovery (an MPI rank
failure kills the job) and suggests checkpoint-reload restart as the
upgrade. Here: `snapshot()` serializes all request state to JSON
(device KV is NOT saved), `restore()` replays committed tokens through
normal chunked prefill on a fresh executor — greedy continuations must
be bit-identical to the uninterrupted run, including stop sequences
that span the restart boundary.
"""

import json

import jax
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, max_position_embeddings=128)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    return params, cfg


KW = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8)


def _run_plain(params, cfg, jobs):
    ex = Executor(params, cfg, seed=0, **KW)
    ids = [ex.submit(**j) for j in jobs]
    done = ex.run()
    return [done[r] for r in ids]


def test_mid_decode_snapshot_resumes_exactly(setup):
    params, cfg = setup
    jobs = [dict(prompt=[3, 1, 4, 1, 5], max_new_tokens=12),
            dict(prompt=[2, 7, 2, 8], max_new_tokens=9)]
    want = _run_plain(params, cfg, jobs)

    ex = Executor(params, cfg, seed=0, **KW)
    ids = [ex.submit(**j) for j in jobs]
    # advance until both lanes have decoded a few tokens, then "crash"
    while ex.has_work:
        ex.step()
        live = [r for r in ex.slots if r is not None]
        if len(live) == 2 and all(len(r.generated) >= 4 for r in live):
            break
    assert ex.num_active == 2                      # crashed mid-decode
    snap = json.loads(json.dumps(ex.snapshot()))   # full JSON round-trip

    ex2 = Executor(params, cfg, seed=0, **KW)
    ex2.restore(snap)
    done = ex2.run()
    for rid, w in zip(ids, want):
        got = done[rid]
        assert got.generated == w.generated
        assert got.prompt == w.prompt                  # unstitched
        assert got.logprobs == w.logprobs
        assert got.max_new_tokens == w.max_new_tokens  # restored


def test_stop_sequence_spans_restart_boundary(setup):
    """A 2-token stop whose first token was generated BEFORE the crash
    must still fire on the first post-restore token."""
    params, cfg = setup
    base = _run_plain(params, cfg,
                      [dict(prompt=[3, 1, 4], max_new_tokens=10)])[0]
    stop = base.generated[3:5]
    want = _run_plain(params, cfg,
                      [dict(prompt=[3, 1, 4], max_new_tokens=10,
                            stop_sequences=[stop])])[0]
    assert want.generated == base.generated[:5]    # sanity: stop fired

    ex = Executor(params, cfg, seed=0, **KW)
    rid = ex.submit([3, 1, 4], max_new_tokens=10, stop_sequences=[stop])
    while True:                                    # crash between the two
        ex.step()
        live = [r for r in ex.slots if r is not None]
        if live and len(live[0].generated) == 4:
            break
    ex2 = Executor(params, cfg, seed=0, **KW)
    ex2.restore(json.loads(json.dumps(ex.snapshot())))
    assert ex2.run()[rid].generated == want.generated


def test_finished_and_queue_survive(setup):
    """Finished results ride the snapshot; queued (never-prefilled)
    requests restart from scratch; new submissions get fresh ids."""
    params, cfg = setup
    ex = Executor(params, cfg, seed=0, **KW)
    a = ex.submit([3, 1, 4], max_new_tokens=3)
    ex.run()                                       # a finishes
    b = ex.submit([2, 7], max_new_tokens=5)        # stays queued
    snap = ex.snapshot()

    ex2 = Executor(params, cfg, seed=0, **KW)
    ex2.restore(snap)
    assert ex2.finished[a].generated == ex.finished[a].generated
    done = ex2.run()
    want = _run_plain(params, cfg, [dict(prompt=[2, 7], max_new_tokens=5)])
    assert done[b].generated == want[0].generated
    c = ex2.submit([9, 9], max_new_tokens=2)
    assert c > max(a, b)


def test_snapshot_restore_under_tp_mesh(setup):
    """Crash-resume for tensor-parallel serving: a mid-flight snapshot
    from a tp=2 mesh executor restores onto a fresh mesh executor with
    bit-identical continuation."""
    import numpy as np
    from jax.sharding import Mesh
    params, cfg = setup
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 1, 2),
                ("dp", "pp", "tp"))
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8)

    plain = Executor(params, cfg, seed=0, mesh=mesh, **kw)
    rid = plain.submit([3, 1, 4, 1], max_new_tokens=10)
    want = plain.run()[rid].generated

    ex = Executor(params, cfg, seed=0, mesh=mesh, **kw)
    ex.submit([3, 1, 4, 1], max_new_tokens=10)
    while ex.has_work:
        ex.step()
        live = [r for r in ex.slots if r is not None]
        if live and len(live[0].generated) >= 4:
            break
    snap = json.loads(json.dumps(ex.snapshot()))

    ex2 = Executor(params, cfg, seed=0, mesh=mesh, **kw)
    ex2.restore(snap)
    got = ex2.run()[rid]
    assert got.generated == want
    assert got.prompt == [3, 1, 4, 1]
