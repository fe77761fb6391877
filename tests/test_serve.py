"""HTTP serving tests: concurrent requests through the stepper thread."""

import json
import threading
import urllib.request

import jax
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer
    from mixq_tensorrt_llm_tpu.serve import InferenceServer, make_handler

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))

    class FakeLLM:
        tokenizer = None
        max_seq_len = 64

        def make_executor(self, **kw):
            from mixq_tensorrt_llm_tpu.runtime import Executor
            return Executor(params, cfg, max_seq_len=64, max_batch=2,
                            block_size=8, prefill_chunk=16)

    srv = InferenceServer(FakeLLM())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    kv = h["kv"]      # reference KvCacheStats fields
    assert kv["free_num_blocks"] + kv["used_num_blocks"] \
        + kv["cached_num_blocks"] == kv["max_num_blocks"]


def test_generate_tokens(server):
    out = _post(server, {"prompt": [1, 2, 3], "max_new_tokens": 5,
                         "eos": False})
    assert len(out["tokens"]) == 5
    assert out["stats"]["prompt_tokens"] == 3
    assert out["stats"]["ttft_s"] >= 0


def test_concurrent_requests_batch(server):
    results = {}

    def go(name, prompt):
        results[name] = _post(server, {"prompt": prompt,
                                       "max_new_tokens": 6, "eos": False})

    threads = [threading.Thread(target=go, args=(i, [10 + i, 20 + i]))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 4
    for out in results.values():
        assert len(out["tokens"]) == 6


def test_bad_request(server):
    req = urllib.request.Request(
        server + "/generate", json.dumps({"prompt": [1] * 100,
                                          "max_new_tokens": 50}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "max_seq_len" in json.loads(e.read())["error"]


def test_sampling_and_bad_words_fields(server):
    base = _post(server, {"prompt": [1, 2, 3], "max_new_tokens": 6,
                          "eos": False})
    tok = base["tokens"][1]
    out = _post(server, {"prompt": [1, 2, 3], "max_new_tokens": 6,
                         "eos": False, "bad_words": [[tok]]})
    assert tok not in out["tokens"]
    # sampling knobs parse and run (greedy=False implied by temperature)
    out2 = _post(server, {"prompt": [1, 2, 3], "max_new_tokens": 6,
                          "eos": False, "temperature": 2.0, "top_k": 20})
    assert len(out2["tokens"]) == 6


def test_generate_stream_tokens(server):
    """/generate_stream yields one JSON line per token (chunked), then a
    summary line; tokens equal the non-streaming endpoint's."""
    base = _post(server, {"prompt": [1, 2, 3], "max_new_tokens": 6,
                          "eos": False})
    req = urllib.request.Request(
        server + "/generate_stream",
        json.dumps({"prompt": [1, 2, 3], "max_new_tokens": 6,
                    "eos": False}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        lines = [json.loads(l) for l in r.read().decode().splitlines() if l]
    toks = [l["token"] for l in lines if "token" in l]
    assert toks == base["tokens"]
    assert lines[-1]["done"] and lines[-1]["generated_tokens"] == 6


def test_stream_with_bad_words(server):
    """/generate_stream accepts bad_words (token lists here) without
    killing the stepper thread and the ban holds."""
    base = _post(server, {"prompt": [1, 2, 3], "max_new_tokens": 6,
                          "eos": False})
    tok = base["tokens"][1]
    req = urllib.request.Request(
        server + "/generate_stream",
        json.dumps({"prompt": [1, 2, 3], "max_new_tokens": 6,
                    "eos": False, "bad_words": [[tok]]}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        lines = [json.loads(l) for l in r.read().decode().splitlines() if l]
    toks = [l["token"] for l in lines if "token" in l]
    assert tok not in toks and len(toks) == 6


def test_snapshot_restore_cycle(tmp_path):
    """A server booted with snapshot_path resumes a crashed process's
    pending work exactly and exposes the result via /result (its HTTP
    client died with the old process); shutdown persists a snapshot."""
    import os
    import time as _time
    from mixq_tensorrt_llm_tpu.runtime import Executor
    from mixq_tensorrt_llm_tpu.serve import InferenceServer

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    kw = dict(max_seq_len=64, max_batch=2, block_size=8, prefill_chunk=16)

    plain = Executor(params, cfg, seed=0, **kw)
    rid0 = plain.submit([4, 5, 6], max_new_tokens=8)
    want = plain.run()[rid0].generated

    # "previous process": run part way, snapshot to disk, vanish
    old = Executor(params, cfg, seed=0, **kw)
    rid = old.submit([4, 5, 6], max_new_tokens=8)
    while old.has_work:
        old.step()
        live = [r for r in old.slots if r is not None]
        if live and len(live[0].generated) >= 3:
            break
    path = str(tmp_path / "snap.json")
    with open(path, "w") as f:
        json.dump(old.snapshot(), f)

    class FakeLLM:
        tokenizer = None
        max_seq_len = 64

        def make_executor(self, **_):
            return Executor(params, cfg, seed=0, **kw)

    srv = InferenceServer(FakeLLM(), snapshot_path=path,
                          snapshot_interval_s=0.0)
    try:
        deadline = _time.time() + 120
        out = None
        while out is None and _time.time() < deadline:
            out = srv.result(rid)
            _time.sleep(0.02)
        assert out is not None and out["tokens"] == want
    finally:
        srv.shutdown()
    assert os.path.exists(path)          # shutdown persisted a snapshot
    with open(path) as f:
        snap = json.load(f)
    assert snap["pending"] == []         # nothing left in flight


def test_burst_server_matches_single_step():
    """burst>1 server: decode rides compiled bursts (and mixed-phase
    bursts behind prefill chunks); greedy outputs equal the step server."""
    from mixq_tensorrt_llm_tpu.serve import InferenceServer
    from mixq_tensorrt_llm_tpu.runtime import Executor

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))

    class FakeLLM:
        tokenizer = None
        max_seq_len = 64

        def make_executor(self, **_):
            return Executor(params, cfg, seed=0, max_seq_len=64,
                            max_batch=4, block_size=8, prefill_chunk=16)

    prompts = [[3, 1, 4, 1], [2] * 9, [7] * 17, [5, 6]]

    def drive(burst):
        srv = InferenceServer(FakeLLM(), burst=burst)
        try:
            import concurrent.futures as cf
            with cf.ThreadPoolExecutor(4) as pool:
                outs = list(pool.map(
                    lambda p: srv.generate(p, max_new_tokens=10,
                                           use_eos=False)["tokens"],
                    prompts))
            return outs
        finally:
            srv.shutdown()

    assert drive(8) == drive(1)
