"""High-level LLM API: one-liner load/quantize/generate.

Mirrors the reference hlapi LLM surface (tensorrt_llm/hlapi/llm.py — LLM()
auto-quantize/build/cache then .generate(); SURVEY T11) without the engine
step: "build" is jit, the compile cache is XLA's, and the quantize step
produces our checkpoint directory (cached alongside the model or in
~/.cache/mixq_tpu).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import List, Optional, Sequence, Union

import numpy as np

from .quant.config import QuantAlgo, QuantConfig, KVCacheQuantAlgo
from .runtime.sampler import SamplingConfig
from .runtime.session import GenerationSession, GenerationOutput


def _is_our_checkpoint(path: str) -> bool:
    cfg = os.path.join(path, "config.json")
    if not os.path.exists(cfg):
        return False
    with open(cfg) as f:
        d = json.load(f)
    return "quant" in d and "arch" in d


@dataclasses.dataclass
class LLM:
    """llm = LLM("/path/to/hf-or-ckpt", quant="int8_mix"); llm.generate(...)"""

    model: str
    quant: Union[str, QuantConfig, None] = None
    kv_cache_quant: str = "none"
    max_seq_len: int = 2048
    act_scales_path: Optional[str] = None
    cache_dir: Optional[str] = None
    tokenizer: Optional[object] = None

    def __post_init__(self):
        if isinstance(self.quant, str):
            self.quant = QuantConfig(
                algo=QuantAlgo(self.quant),
                kv_cache=KVCacheQuantAlgo(self.kv_cache_quant))
        from .convert.checkpoint import load_checkpoint

        if _is_our_checkpoint(self.model):
            ckpt_dir = self.model
        else:
            ckpt_dir = self._ensure_quantized(self.model)
        self.params, self.cfg = load_checkpoint(ckpt_dir)
        self._ckpt_dir = ckpt_dir
        if self.tokenizer is None:
            self.tokenizer = self._load_tokenizer()
        self.session = GenerationSession(self.params, self.cfg,
                                         max_seq_len=self.max_seq_len)

    def _ensure_quantized(self, hf_dir: str) -> str:
        from .convert.hf import quantize_hf_model

        quant = self.quant or QuantConfig()
        key = hashlib.sha1(
            f"{os.path.abspath(hf_dir)}|{quant.to_json()}".encode()
        ).hexdigest()[:12]
        base = self.cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "mixq_tpu")
        out = os.path.join(base, key)
        if not os.path.exists(os.path.join(out, "model.safetensors")):
            quantize_hf_model(hf_dir, out, quant,
                              act_scales_path=self.act_scales_path)
        return out

    def _load_tokenizer(self):
        return (_try_tokenizer(self.model)
                or _try_tokenizer(self._ckpt_dir))

    # ------------------------------------------------------------------
    def generate(self, prompts: Union[str, Sequence[str]],
                 max_new_tokens: int = 64,
                 sampling: SamplingConfig = SamplingConfig(),
                 bad_words: Optional[Sequence[str]] = None,
                 seed: int = 0) -> List[str]:
        """Text in, text out. bad_words are strings that may never be
        generated (tokenized without special tokens; reference run.py
        --bad_words)."""
        assert self.tokenizer is not None, \
            "no tokenizer found; pass tokenizer= or use generate_tokens()"
        single = isinstance(prompts, str)
        if single:
            prompts = [prompts]
        token_lists = [self.tokenizer(p)["input_ids"] for p in prompts]
        eos = getattr(self.tokenizer, "eos_token_id", None)
        bw = [self.tokenizer(w, add_special_tokens=False)["input_ids"]
              for w in bad_words] if bad_words else None
        out = self.session.generate(token_lists, max_new_tokens,
                                    sampling=sampling, eos_token_id=eos,
                                    bad_words=bw, seed=seed)
        texts = [self.tokenizer.decode(seq[len(tl):],
                                       skip_special_tokens=True)
                 for seq, tl in zip(out.sequences, token_lists)]
        return texts[0] if single else texts

    def generate_tokens(self, prompts: Sequence[Sequence[int]],
                        max_new_tokens: int = 64,
                        sampling: SamplingConfig = SamplingConfig(),
                        eos_token_id: Optional[int] = None,
                        num_beams: int = 1,
                        bad_words: Optional[Sequence[Sequence[int]]] = None,
                        stop_sequences: Optional[
                            Sequence[Sequence[int]]] = None,
                        logits_processors: Sequence = (),
                        seed: int = 0) -> GenerationOutput:
        """Token-id in, GenerationOutput out. num_beams > 1 runs paged
        beam search with KV-block sharing across beams. bad_words are
        banned token-id sequences; logits_processors are jax-traceable
        `(logits, history) -> logits` callables (see
        GenerationSession.generate)."""
        return self.session.generate(list(prompts), max_new_tokens,
                                     sampling=sampling,
                                     eos_token_id=eos_token_id,
                                     num_beams=num_beams,
                                     bad_words=bad_words,
                                     stop_sequences=stop_sequences,
                                     logits_processors=logits_processors,
                                     seed=seed)

    def generate_speculative(self, draft: "LLM",
                             prompts: Sequence[Sequence[int]],
                             max_new_tokens: int = 64, gamma: int = 4,
                             temperature: float = 1.0,
                             eos_token_id: Optional[int] = None,
                             seed: int = 0):
        """Batched stochastic speculative decoding with `draft` proposing
        gamma tokens per round (reference speculative/medusa niche;
        temperature <= 0 = greedy, provably equal to target-only greedy).
        Returns (token lists incl. prompts, SpecStats)."""
        from .runtime.speculative import speculative_generate_batched
        return speculative_generate_batched(
            self.params, self.cfg, draft.params, draft.cfg,
            [list(p) for p in prompts], max_new_tokens, gamma=gamma,
            temperature=temperature, eos_token_id=eos_token_id,
            max_seq_len=self.max_seq_len, seed=seed)

    def generate_medusa(self, heads, prompt: Sequence[int],
                        max_new_tokens: int = 64, choices=None):
        """Greedy Medusa decoding: self-drafting heads verified in ONE
        forward over a static token tree (reference models/medusa +
        runtime/medusa_utils.py). Output equals plain greedy decode;
        trained heads raise tokens/step. Returns (tokens, MedusaStats)."""
        from .runtime.medusa import medusa_generate
        return medusa_generate(self.params, self.cfg, heads, list(prompt),
                               max_new_tokens, choices=choices,
                               max_seq_len=self.max_seq_len)

    def generate_redrafter(self, drafter, prompt: Sequence[int],
                           max_new_tokens: int = 64, num_beams: int = 4,
                           draft_len: int = 4):
        """Greedy ReDrafter decoding: a recurrent drafter proposes
        num_beams beams of draft_len tokens, verified in ONE forward over
        a static beam block (reference models/redrafter +
        runtime/redrafter_utils.py). Output equals plain greedy decode;
        a trained drafter raises tokens/step.
        Returns (tokens, ReDrafterStats)."""
        from .runtime.redrafter import redrafter_generate
        return redrafter_generate(self.params, self.cfg, drafter,
                                  list(prompt), max_new_tokens,
                                  num_beams=num_beams, draft_len=draft_len,
                                  max_seq_len=self.max_seq_len)

    def make_executor(self, max_batch: int = 8, block_size: int = 64,
                      prefill_chunk: int = 256,
                      sampling: SamplingConfig = SamplingConfig(),
                      mesh=None, seed: int = 0, **kw):
        """Continuous-batching executor over this model (paged KV).

        ex = llm.make_executor(max_batch=16)
        rid = ex.submit(llm.tokenizer(text)["input_ids"], max_new_tokens=64)
        done = ex.run()

        mesh: optional jax.sharding.Mesh with a 'tp' axis — weights and
        paged KV pools are sharded and the serving step runs SPMD
        (tensor-parallel serving; reference TP engines + NCCL allreduce).
        Extra kwargs pass through to Executor (window_blocks,
        logits_processors, ...).
        """
        from .runtime.scheduler import Executor
        return Executor(self.params, self.cfg, max_batch=max_batch,
                        max_seq_len=self.max_seq_len, block_size=block_size,
                        prefill_chunk=prefill_chunk, sampling=sampling,
                        mesh=mesh, seed=seed, **kw)

    def evaluate_ppl(self, token_stream: Sequence[int], seq_len: int = 512,
                     batch_size: int = 8, max_blocks: Optional[int] = None):
        from .eval.ppl import evaluate_ppl
        return evaluate_ppl(self.params, self.cfg, token_stream,
                            seq_len=seq_len, batch_size=batch_size,
                            max_blocks=max_blocks)


def _as_quant_config(quant) -> QuantConfig:
    if quant is None:
        return QuantConfig()
    if isinstance(quant, str):
        return QuantConfig(algo=QuantAlgo(quant))
    return quant


def _try_tokenizer(path: str):
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(path)
    except Exception:
        return None


def _load_hf_family(model: str, module, allowed: tuple, label: str,
                    quant):
    """Shared HF-dir loader for the non-decoder API classes: config
    check -> config_from_hf -> params_from_hf (quantizing in memory)."""
    from .convert.hf import load_hf_config, load_hf_state_dict
    hf_cfg = load_hf_config(model)
    mt = hf_cfg.model_type.lower()
    assert mt in allowed, f"{label} supports {allowed}, got {mt!r}"
    cfg = module.config_from_hf(hf_cfg, _as_quant_config(quant))
    return cfg, module.params_from_hf(cfg, load_hf_state_dict(model))


@dataclasses.dataclass
class Seq2SeqLM:
    """Encoder-decoder (T5/mT5) one-liner — the reference enc_dec branch
    (tensorrt_llm/models/enc_dec): s2s = Seq2SeqLM("/path/to/t5",
    quant="w8a16"); s2s.generate("translate ...")."""

    model: str
    quant: Union[str, QuantConfig, None] = None
    tokenizer: Optional[object] = None

    def __post_init__(self):
        from .models import t5 as mt5
        self.cfg, self.params = _load_hf_family(
            self.model, mt5, ("t5", "mt5", "umt5"), "Seq2SeqLM", self.quant)
        if self.tokenizer is None:
            self.tokenizer = _try_tokenizer(self.model)

    def generate_tokens(self, input_ids: Sequence[Sequence[int]],
                        max_new_tokens: int = 64) -> List[List[int]]:
        """Greedy enc-dec generation; returns decoder token lists
        including the decoder start token."""
        from .models.t5 import t5_generate
        return t5_generate(self.params, self.cfg,
                           [list(p) for p in input_ids], max_new_tokens)

    def generate(self, prompts: Union[str, Sequence[str]],
                 max_new_tokens: int = 64) -> Union[str, List[str]]:
        assert self.tokenizer is not None, \
            "no tokenizer found; pass tokenizer= or use generate_tokens()"
        single = isinstance(prompts, str)
        if single:
            prompts = [prompts]
        ids = [self.tokenizer(p)["input_ids"] for p in prompts]
        outs = self.generate_tokens(ids, max_new_tokens)
        texts = [self.tokenizer.decode(o, skip_special_tokens=True)
                 for o in outs]
        return texts[0] if single else texts


@dataclasses.dataclass
class Encoder:
    """Encoder-only (BERT) one-liner — the reference bert branch
    (tensorrt_llm/models/bert): enc = Encoder("/path/to/bert");
    hidden, pooled = enc.encode(["a sentence"])."""

    model: str
    quant: Union[str, QuantConfig, None] = None
    tokenizer: Optional[object] = None

    def __post_init__(self):
        from .models import bert as mbert
        self.cfg, self.params = _load_hf_family(
            self.model, mbert, ("bert",), "Encoder", self.quant)
        if self.tokenizer is None:
            self.tokenizer = _try_tokenizer(self.model)

    def encode_tokens(self, input_ids: Sequence[Sequence[int]]):
        """Padded batch encode: returns (hidden (B,S,H), pooled (B,H))."""
        from .models import bert as mbert
        import jax.numpy as jnp
        b = len(input_ids)
        s = max(len(x) for x in input_ids)
        toks = np.zeros((b, s), np.int32)
        for i, t in enumerate(input_ids):
            toks[i, :len(t)] = t
        lens = jnp.asarray([len(t) for t in input_ids], jnp.int32)
        return mbert.forward(self.params, self.cfg, jnp.asarray(toks), lens)

    def encode(self, texts: Union[str, Sequence[str]]):
        assert self.tokenizer is not None, \
            "no tokenizer found; pass tokenizer= or use encode_tokens()"
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        ids = [self.tokenizer(t)["input_ids"] for t in texts]
        return self.encode_tokens(ids)
