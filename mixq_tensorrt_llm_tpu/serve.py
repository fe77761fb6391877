"""HTTP serving front-end over the continuous-batching executor.

Reference parity: the C++ executor's serving role (ModelRunnerCpp /
executorWorker accepting inflight requests; SURVEY T10). A stdlib
ThreadingHTTPServer accepts POST /generate while one stepper thread drives
Executor.step() — requests batch together automatically between steps.

  POST /generate  {"prompt": str | [int], "max_new_tokens": int,
                   "eos": bool, "min_new_tokens": int,
                   "temperature"/"top_k"/"top_p"/"greedy"/
                   "repetition_penalty": sampling overrides,
                   "bad_words": [str | [int]],
                   "stop": [[int]]}
       -> {"text", "tokens", "logprobs", "stats"}
  POST /generate_stream  same body -> chunked JSON lines, one per token
                   ({"token": id, "text": piece}), final line {"done": ...}
                   (reference streaming generation, decode_stream)
  GET  /health                                 -> {"status": "ok", ...}
  GET  /result?id=N  pop a finished request's output (resumed requests
                   whose original client died with the previous process)

Crash-resume: pass snapshot_path= (CLI --snapshot_path) to restore
pending work at boot and snapshot periodically + on shutdown
(Executor.snapshot/restore; greedy continuations are exact).

Start: python -m mixq_tensorrt_llm_tpu.cli serve --model <dir> --port 8000
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class InferenceServer:
    def __init__(self, llm, max_batch: int = 8, block_size: int = 64,
                 prefill_chunk: int = 256, snapshot_path=None,
                 snapshot_interval_s: float = 30.0,
                 max_queue_size: int = 0, warmup: bool = False,
                 burst: int = 1):
        self.llm = llm
        self.burst = burst
        self.executor = llm.make_executor(max_batch=max_batch,
                                          block_size=block_size,
                                          prefill_chunk=prefill_chunk,
                                          max_queue_size=max_queue_size)
        if warmup:
            # compile prefill/decode before accepting traffic so the
            # first request sees steady-state latency (with burst > 1:
            # every pow2 burst rung and prefill lane variant too). With a
            # persistent cache (cli serve --cache_dir) the second start
            # LOADS instead of compiling — the printed compiles/loads
            # split shows which happened (the deploy-flow signal)
            from .utils import compile_watch
            t0 = time.time()
            c0 = compile_watch.compile_count()
            h0 = compile_watch.cache_hit_count()
            self.executor.warmup(burst=burst)
            print(f"[serve] warmup {time.time()-t0:.1f}s: "
                  f"{compile_watch.compile_count()-c0} compiled, "
                  f"{compile_watch.cache_hit_count()-h0} loaded from "
                  f"cache", flush=True)
        # crash-resume: reload pending work from a previous process's
        # snapshot and keep snapshotting while work is in flight
        # (Executor.snapshot/restore; results of resumed requests land in
        # `finished` for GET /result since their clients are gone)
        self.snapshot_path = snapshot_path
        self._snapshot_interval = snapshot_interval_s
        self._last_snapshot = 0.0
        if snapshot_path is not None and os.path.exists(snapshot_path):
            with open(snapshot_path) as f:
                self.executor.restore(json.load(f))
        self._lock = threading.Lock()
        self._events = {}
        self._stop = threading.Event()
        self._stepper = threading.Thread(target=self._step_loop, daemon=True)
        self._stepper.start()

    def _step_loop(self):
        while not self._stop.is_set():
            with self._lock:
                # burst > 1 trades per-token streaming granularity for
                # throughput: decode runs in compiled k-step bursts (and
                # rides behind prefill chunks), stream chunks flush per
                # burst instead of per token
                worked = (self.executor.step_serving(self.burst)
                          if self.executor.has_work else 0)
                for rid, req in list(self.executor.finished.items()):
                    ev = self._events.get(rid)
                    if ev is not None:
                        ev.set()
                # gate on has_work, not tokens produced: mid-prefill steps
                # return 0 but the queue/prefill state still needs saving
                if (self.snapshot_path is not None
                        and (worked or self.executor.has_work)
                        and time.monotonic() - self._last_snapshot
                        > self._snapshot_interval):
                    self._write_snapshot()
            if not worked:
                time.sleep(0.005)

    def _write_snapshot(self):
        """Atomic snapshot write (tmp + rename); caller holds _lock."""
        tmp = self.snapshot_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.executor.snapshot(), f)
        os.replace(tmp, self.snapshot_path)
        self._last_snapshot = time.monotonic()

    def _prep(self, prompt, use_eos: bool):
        """(token ids, eos id) from a string or token-list prompt."""
        if isinstance(prompt, str):
            assert self.llm.tokenizer is not None, "no tokenizer in checkpoint"
            ids = self.llm.tokenizer(prompt)["input_ids"]
        else:
            ids = list(prompt)
        eos = (getattr(self.llm.tokenizer, "eos_token_id", None)
               if use_eos else None)
        return ids, eos

    def generate(self, prompt, max_new_tokens: int = 64,
                 use_eos: bool = True, timeout: float = 600.0,
                 sampling=None, min_new_tokens: int = 0,
                 bad_words=None, stop_sequences=None) -> dict:
        ids, eos = self._prep(prompt, use_eos)
        bad_words = self._tokenize_words(bad_words)
        ev = threading.Event()
        with self._lock:
            rid = self.executor.submit(ids, max_new_tokens=max_new_tokens,
                                       eos_token_id=eos, sampling=sampling,
                                       min_new_tokens=min_new_tokens,
                                       bad_words=bad_words,
                                       stop_sequences=stop_sequences)
            self._events[rid] = ev
        if not ev.wait(timeout):
            raise TimeoutError(f"request {rid} timed out")
        with self._lock:
            req = self.executor.finished.pop(rid)
            self._events.pop(rid, None)
        text = (self.llm.tokenizer.decode(req.generated,
                                          skip_special_tokens=True)
                if self.llm.tokenizer else None)
        return {
            "text": text,
            "tokens": req.generated,
            "logprobs": [round(x, 6) for x in req.logprobs],
            "stats": {
                "prompt_tokens": len(req.prompt),
                "generated_tokens": len(req.generated),
                "ttft_s": round(req.first_token_time - req.submit_time, 4),
                "total_s": round(req.finish_time - req.submit_time, 4),
            },
        }

    def _tokenize_words(self, words):
        """Strings tokenize (no special tokens); token-id lists pass."""
        if not words:
            return words
        assert not any(isinstance(w, str) for w in words) \
            or self.llm.tokenizer is not None, "no tokenizer in checkpoint"
        return [self.llm.tokenizer(w, add_special_tokens=False)["input_ids"]
                if isinstance(w, str) else list(w) for w in words]

    def generate_stream(self, prompt, max_new_tokens: int = 64,
                        use_eos: bool = True, timeout: float = 600.0,
                        sampling=None, min_new_tokens: int = 0,
                        bad_words=None, stop_sequences=None):
        """Yield one dict per generated token, then a final summary dict
        (reference streaming / decode_stream). Tokens flow through the
        executor's on_token callback into a queue the HTTP thread drains."""
        import queue
        ids, eos = self._prep(prompt, use_eos)
        q: "queue.Queue" = queue.Queue()
        bad_words = self._tokenize_words(bad_words)
        with self._lock:
            rid = self.executor.submit(
                ids, max_new_tokens=max_new_tokens, eos_token_id=eos,
                sampling=sampling, min_new_tokens=min_new_tokens,
                bad_words=bad_words, stop_sequences=stop_sequences,
                on_token=lambda req, tok: q.put(tok))
            ev = threading.Event()
            self._events[rid] = ev
        t0 = time.perf_counter()
        while True:
            try:
                tok = q.get(timeout=0.05)
            except queue.Empty:
                if ev.is_set() and q.empty():
                    break   # finished and fully drained
                if time.perf_counter() - t0 > timeout:
                    raise TimeoutError(f"request {rid} stalled")
                continue
            piece = (self.llm.tokenizer.decode([tok])
                     if self.llm.tokenizer else None)
            yield {"token": int(tok), "text": piece}
        with self._lock:
            req = self.executor.finished.pop(rid)
            self._events.pop(rid, None)
        yield {"done": True, "generated_tokens": len(req.generated),
               "logprobs": [round(x, 6) for x in req.logprobs]}

    def result(self, rid: int):
        """Pop a finished request's output (for requests resumed from a
        snapshot, whose original HTTP client is gone). None if unknown or
        still running."""
        with self._lock:
            req = self.executor.finished.pop(rid, None)
        if req is None:
            return None
        text = (self.llm.tokenizer.decode(req.generated,
                                          skip_special_tokens=True)
                if self.llm.tokenizer else None)
        return {"text": text, "tokens": req.generated,
                "logprobs": [round(x, 6) for x in req.logprobs]}

    def shutdown(self):
        self._stop.set()
        self._stepper.join(timeout=5)
        if self.snapshot_path is not None:
            with self._lock:
                self._write_snapshot()


def make_handler(server: InferenceServer):
    from .runtime.scheduler import QueueFullError

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                with server._lock:
                    ex = server.executor
                    st = ex.get_latest_iteration_stats(20)
                    payload = {"status": "ok", "active": ex.num_active,
                               "queued": len(ex.queue),
                               "prefilling": len(ex.prefilling),
                               "kv": ex.get_kv_cache_stats(),
                               # engine contract: 0 == no serving shape
                               # slipped past warmup (null before warmup);
                               # cache_loads splits compile vs ~1.7 s
                               # persistent-cache load (both fire the
                               # duration event — utils/compile_watch)
                               "compiles_since_warmup":
                                   ex.compiles_since_warmup,
                               "cache_loads_since_warmup":
                                   ex.cache_loads_since_warmup}
                    if st:
                        dt = sum(x.step_time_s for x in st)
                        payload.update(
                            kv_cache_usage=round(st[-1].kv_cache_usage, 4),
                            recent_tokens_per_s=round(
                                sum(x.tokens_produced for x in st)
                                / max(dt, 1e-9), 1),
                            last_step_ms=round(
                                st[-1].step_time_s * 1e3, 2))
                self._json(200, payload)
            elif self.path.startswith("/result"):
                from urllib.parse import parse_qs, urlparse
                q = parse_qs(urlparse(self.path).query)
                try:
                    rid = int(q["id"][0])
                except (KeyError, ValueError):
                    self._json(400, {"error": "need ?id=<req_id>"})
                    return
                out = server.result(rid)
                if out is None:
                    self._json(404, {"error": f"no finished result {rid}"})
                else:
                    self._json(200, out)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/generate", "/generate_stream"):
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                sampling = None
                samp_keys = ("temperature", "top_k", "top_p", "greedy",
                             "repetition_penalty")
                if any(k in req for k in samp_keys):
                    from .runtime.sampler import SamplingConfig
                    over = {k: req[k] for k in samp_keys if k in req}
                    # a sampling knob implies stochastic unless told not to
                    over.setdefault("greedy", False)
                    sampling = SamplingConfig(**over)
                kw = dict(
                    max_new_tokens=int(req.get("max_new_tokens", 64)),
                    use_eos=bool(req.get("eos", True)),
                    sampling=sampling,
                    min_new_tokens=int(req.get("min_new_tokens", 0)),
                    bad_words=req.get("bad_words"),
                    stop_sequences=req.get("stop"))
                if self.path == "/generate_stream":
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/jsonlines")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    for item in server.generate_stream(
                            req.get("prompt", ""), **kw):
                        line = (json.dumps(item) + "\n").encode()
                        self.wfile.write(b"%x\r\n%s\r\n"
                                         % (len(line), line))
                        self.wfile.flush()
                    self.wfile.write(b"0\r\n\r\n")
                    return
                out = server.generate(req.get("prompt", ""), **kw)
                self._json(200, out)
            except QueueFullError as e:
                self._json(503, {"error": str(e)})       # backpressure
            except (ValueError, KeyError, AssertionError) as e:
                self._json(400, {"error": str(e)})
            except TimeoutError as e:
                self._json(504, {"error": str(e)})

    return Handler


def run_server(llm, host: str = "127.0.0.1", port: int = 8000,
               max_batch: int = 8, block_size: int = 64,
               prefill_chunk: int = 256, snapshot_path=None,
               max_queue_size: int = 0, warmup: bool = False,
               burst: int = 1) -> None:
    srv = InferenceServer(llm, max_batch=max_batch, block_size=block_size,
                          prefill_chunk=prefill_chunk,
                          snapshot_path=snapshot_path,
                          max_queue_size=max_queue_size, warmup=warmup,
                          burst=burst)
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    print(f"serving on http://{host}:{port} "
          f"(POST /generate, GET /health)", flush=True)
    try:
        httpd.serve_forever()
    finally:
        srv.shutdown()
