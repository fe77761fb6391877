"""GenerationSession: jitted prefill/decode loop over the functional model.

TPU-native replacement for the reference's GenerationSession / ModelRunner
(tensorrt_llm/runtime/generation.py:2893 handle_per_step hot loop,
model_runner.py). There is no engine: `jax.jit` with static shape buckets
IS the engine build, and the XLA compile cache replaces the TRT timing
cache. Decode steps run a single fused program per step with the cache
donated, so the KV cache updates in place like the reference's ping-pong
buffers (generation.py:3370) without the bookkeeping.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common as mcommon
from ..models.common import ModelConfig
from .sampler import SamplingConfig, sample


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"sequence length {n} exceeds max bucket {buckets[-1]}")


@dataclasses.dataclass
class GenerationOutput:
    sequences: List[List[int]]          # prompt + generated, per sequence
    num_prompt_tokens: List[int]
    num_generated: List[int]
    prefill_time_s: float = 0.0
    decode_time_s: float = 0.0
    # per-sequence log-softmax of each emitted token (reference
    # output_log_probs); None for paths that do not record them (beams)
    logprobs: Optional[List[List[float]]] = None
    # prompt-position logits (reference --gather_context_logits): list of
    # (prompt_len, vocab) arrays, only when requested
    context_logits: Optional[list] = None

    @property
    def decode_tokens_per_s(self) -> float:
        n = sum(self.num_generated)
        return n / self.decode_time_s if self.decode_time_s > 0 else 0.0


class GenerationSession:
    """Static-batch generation over jitted prefill/decode programs.

    Shapes are bucketed (prompt length to powers of two, batch as given) so
    each (batch, bucket) pair compiles once and is cached — the analogue of
    the reference's dual optimization profiles (generation.py context/gen
    profiles) without an engine step.
    """

    def __init__(self, params, cfg: ModelConfig, max_seq_len: int = 2048,
                 prefill_buckets: Optional[Sequence[int]] = None,
                 use_flash_prefill: bool = True):
        self.params = params
        self.cfg = cfg
        self.max_seq_len = max_seq_len
        buckets = tuple(
            b for b in (prefill_buckets or
                        (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192))
            if b <= max_seq_len)
        if not buckets or buckets[-1] < max_seq_len:
            buckets = buckets + (max_seq_len,)   # prompts up to the cap fit
        self.prefill_buckets = buckets

        cfg_static = cfg

        @functools.partial(jax.jit, donate_argnums=(2,),
                           static_argnames=("full_logits",))
        def _prefill(params, tokens, cache, lens, full_logits=False):
            b, s = tokens.shape
            pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
            logits, cache = mcommon.forward(params, cfg_static, tokens, pos,
                                            cache, lens,
                                            full_prefill=use_flash_prefill)
            # gather logits at each sequence's last valid position
            last = jnp.take_along_axis(
                logits, (lens - 1)[:, None, None].astype(jnp.int32), axis=1)
            return last[:, 0], cache, (logits if full_logits else None)

        @functools.partial(jax.jit, donate_argnums=(2,),
                           static_argnames=("sampling", "processors"))
        def _decode(params, tokens, cache, lens, key, sampling, history,
                    suppress_token, suppress_flag, bad_words=None,
                    processors=()):
            b = tokens.shape[0]
            pos = lens[:, None].astype(jnp.int32)
            logits, cache = mcommon.forward(params, cfg_static, tokens, pos,
                                            cache, lens + 1)
            next_tok = sample(logits[:, 0], key, sampling, history=history,
                              suppress_token=suppress_token,
                              suppress_flag=suppress_flag,
                              bad_words=bad_words, processors=processors)
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(logits[:, 0], axis=-1),
                next_tok[:, None], axis=-1)[:, 0]
            return next_tok, lp, cache

        self._prefill = _prefill
        self._decode = _decode

    HISTORY_WINDOW = 64   # repetition-penalty lookback

    def generate(self, prompts: Sequence[Sequence[int]], max_new_tokens: int,
                 sampling: SamplingConfig = SamplingConfig(),
                 eos_token_id: Optional[int] = None,
                 min_new_tokens: int = 0,
                 stop_sequences: Optional[Sequence[Sequence[int]]] = None,
                 num_beams: int = 1, length_penalty: float = 1.0,
                 bad_words: Optional[Sequence[Sequence[int]]] = None,
                 logits_processors: Sequence = (),
                 return_context_logits: bool = False,
                 seed: int = 0) -> GenerationOutput:
        """Generate completions for a batch of token-id prompts.

        min_new_tokens bans eos until that many tokens exist (reference
        dynamic-decoder min_length); stop_sequences are token-id suffixes
        that end a sequence (reference stop-words list). bad_words are
        token-id sequences that may never be generated (reference
        bad-words list, generation.py dynamic decoder banBadWords): the
        final token is masked whenever the preceding tokens match the tail
        of the sequence. logits_processors are jax-traceable callables
        `(logits (B,V), history (B,W)) -> logits` applied to raw logits
        before sampling (reference per-request logits_post_processor,
        executor.pyi LogitsPostProcessor); history is right-aligned,
        -1-padded recent tokens. num_beams > 1 switches to deterministic
        beam search over the paged KV pool with block sharing across beams
        (reference SamplingConfig.num_beams + kv_cache_manager beam-width
        sharing); min_new_tokens / stop_sequences / bad_words AND
        logits_processors apply in-graph inside the beam step
        (runtime.beam.BeamControls) — only `sampling` does not (beam
        search is deterministic). Passing the SAME processor callables
        across generate() calls reuses the compiled beam programs; fresh
        lambdas per call recompile (bounded by beam._MEMO_CAP).
        """
        if num_beams > 1:
            from .beam import paged_beam_search
            nb_ = len(prompts)
            pkey = tuple(id(f) for f in logits_processors)
            cached = getattr(self, "_beam_procs", None)
            if cached is None or cached[0] != pkey:
                # stable (name, fn) tuples per processor SET: the tuple
                # identity feeds beam memo keys, and holding the fns
                # keeps their ids valid
                self._beam_procs = (
                    pkey,
                    tuple((f"p{i}", f)
                          for i, f in enumerate(logits_processors)),
                    list(logits_processors))
                cached = self._beam_procs
            procs = cached[1]
            res = paged_beam_search(
                self.params, self.cfg, [list(p) for p in prompts],
                max_new_tokens, num_beams=num_beams,
                length_penalty=length_penalty, eos_token_id=eos_token_id,
                max_seq_len=self.max_seq_len,
                min_new_tokens=[min_new_tokens] * nb_,
                bad_words=[bad_words] * nb_,
                stop_sequences=[stop_sequences] * nb_,
                logits_processors=procs,
                proc_masks=(np.ones((nb_, len(procs)), bool)
                            if procs else None))
            return GenerationOutput(
                sequences=res.sequences,
                num_prompt_tokens=[len(p) for p in prompts],
                num_generated=[len(s) - len(p)
                               for s, p in zip(res.sequences, prompts)])
        b = len(prompts)
        lens_list = [len(p) for p in prompts]
        max_prompt = max(lens_list)
        if max_prompt + max_new_tokens > self.max_seq_len:
            raise ValueError(
                f"prompt ({max_prompt}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds max_seq_len ({self.max_seq_len})")
        bucket = _bucket(max_prompt, self.prefill_buckets)

        tokens = np.zeros((b, bucket), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, :len(p)] = p
        lens = jnp.asarray(lens_list, jnp.int32)

        cache = mcommon.init_kv_cache(self.cfg, b, self.max_seq_len)

        w = self.HISTORY_WINDOW
        history = np.full((b, w), -1, np.int32)
        for i, p in enumerate(prompts):
            tail = list(p)[-w:]
            history[i, w - len(tail):] = tail   # right-aligned, like decode
        eos_tok = jnp.int32(eos_token_id if eos_token_id is not None else -1)
        from .sampler import pack_bad_words
        bw = pack_bad_words(bad_words) if bad_words else None
        procs = tuple(logits_processors)

        t0 = time.perf_counter()
        last_logits, cache, ctx_logits = self._prefill(
            self.params, jnp.asarray(tokens), cache, lens,
            full_logits=return_context_logits)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        cur = sample(last_logits, sub, sampling, history=jnp.asarray(history),
                     suppress_token=eos_tok,
                     suppress_flag=jnp.int32(1 if min_new_tokens > 1 else 0),
                     bad_words=bw, processors=procs)
        lp0 = jnp.take_along_axis(jax.nn.log_softmax(last_logits, axis=-1),
                                  cur[:, None], axis=-1)[:, 0]
        cur.block_until_ready()
        t1 = time.perf_counter()

        def push_history(tok_np):
            history[:, :-1] = history[:, 1:]
            history[:, -1] = tok_np

        generated = np.zeros((b, max_new_tokens), np.int32)
        logprobs = np.zeros((b, max_new_tokens), np.float32)
        generated[:, 0] = np.asarray(cur)
        logprobs[:, 0] = np.asarray(lp0)
        push_history(generated[:, 0])
        finished = np.zeros((b,), bool)

        def update_finished(step):
            if eos_token_id is not None and step + 1 > min_new_tokens:
                finished[generated[:, step] == eos_token_id] = True
            if stop_sequences:
                for i in range(b):
                    if finished[i]:
                        continue
                    gen = generated[i, :step + 1].tolist()
                    for ss in stop_sequences:
                        if len(gen) >= len(ss) and gen[-len(ss):] == list(ss):
                            finished[i] = True
                            break

        update_finished(0)
        cur_lens = lens

        steps = 1
        for step in range(1, max_new_tokens):
            if finished.all():
                break
            key, sub = jax.random.split(key)
            ban = jnp.int32(1 if step + 1 <= min_new_tokens else 0)
            cur, lp, cache = self._decode(self.params, cur[:, None], cache,
                                          cur_lens, sub, sampling,
                                          jnp.asarray(history), eos_tok, ban,
                                          bad_words=bw, processors=procs)
            cur_lens = cur_lens + 1
            generated[:, step] = np.asarray(cur)
            logprobs[:, step] = np.asarray(lp)
            push_history(generated[:, step])
            update_finished(step)
            steps += 1
        jax.block_until_ready(cur)
        t2 = time.perf_counter()

        sequences, n_gen, lps = [], [], []
        for i, p in enumerate(prompts):
            gen = generated[i, :steps].tolist()
            if eos_token_id is not None and eos_token_id in gen:
                gen = gen[:gen.index(eos_token_id) + 1]
            if stop_sequences:
                for ss in stop_sequences:
                    ls = list(ss)
                    for end in range(len(ls), len(gen) + 1):
                        if gen[end - len(ls):end] == ls:
                            gen = gen[:end]
                            break
                    else:
                        continue
                    break
            sequences.append(list(p) + gen)
            n_gen.append(len(gen))
            lps.append(logprobs[i, :len(gen)].tolist())
        ctx = None
        if return_context_logits:
            cl = np.asarray(ctx_logits)
            ctx = [cl[i, :lens_list[i]] for i in range(b)]
        return GenerationOutput(sequences, lens_list, n_gen,
                                prefill_time_s=t1 - t0,
                                decode_time_s=t2 - t1, logprobs=lps,
                                context_logits=ctx)

    def score_logits(self, tokens: np.ndarray, lens: np.ndarray) -> jax.Array:
        """Full-sequence logits for PPL evaluation. tokens (B,S) padded."""
        b, s = tokens.shape
        cache = mcommon.init_kv_cache(self.cfg, b, s)
        pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
        logits, _ = mcommon.forward(self.params, self.cfg,
                                    jnp.asarray(tokens), pos, cache,
                                    jnp.asarray(lens, jnp.int32))
        return logits
