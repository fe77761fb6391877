"""Standing accuracy gate: quantized-vs-float PPL on a real trained model.

No pretrained checkpoints exist in this environment (no egress), so the
gate builds its own: a byte-level llama trained deterministically on the
repository's source text — real language-like statistics (code + prose),
real activation outliers, fully reproducible from the committed tree. The
float model is then requantized (convert.from_float) under each scheme and
block-PPL'd on a held-out corpus tail, mirroring the reference's PPL gates
(summarize.py:700-708 threshold check, MixQ/src/evalppl.py fp16-vs-int
side-by-side).

Thresholds (relative PPL increase over float) bracket MEASURED deltas at
~2-3x headroom (r2 VERDICT weak #6: the old folklore thresholds were
3-27x looser than measurement and would have passed a quadrupled int4
error). Round-3 measured at 1200 steps: int8 family within noise
(|delta| < 0.1%), int4_mix ~0.5%, w4a16_g ~0.8%:
    w8a16 / int8_mix         <= 0.5%
    int8_mix+kv8 / int8_lr   <= 0.75%
    int4_mix                 <= 1.5%
    w4a16_g                  <= 2.5%

Run: python tools/ppl_gate.py [--steps N] [--out PPL_r03.json]
Writes the JSON artifact and exits nonzero on threshold violation.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# NOTE: the persistent compilation cache is enabled in main() only — doing
# it at import time opted the TEST process into the shared cache, and a
# concurrent writer (another gate run) segfaulted a cache read mid-suite

REPO = Path(__file__).resolve().parent.parent
SEQ = 256


def corpus_tokens() -> np.ndarray:
    """Deterministic byte corpus: the repo's own tracked text files."""
    texts = []
    for pat in ("*.py", "*.md"):
        for p in sorted(REPO.rglob(pat)):
            if any(part.startswith(".") or part in ("artifacts", "build")
                   for part in p.relative_to(REPO).parts):
                continue
            try:
                texts.append(p.read_bytes())
            except OSError:
                continue
    blob = b"\n\n".join(texts)
    return np.frombuffer(blob, np.uint8).astype(np.int32)


def tiny_cfg(quant=None):
    from mixq_tensorrt_llm_tpu.models.common import ModelConfig
    from mixq_tensorrt_llm_tpu.quant.config import QuantConfig
    return ModelConfig(
        vocab_size=256, hidden_size=256, intermediate_size=768,
        num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position_embeddings=SEQ, rms_norm_eps=1e-5,
        quant=quant or QuantConfig())


def train_tiny(tokens: np.ndarray, steps: int, batch: int = 16,
               seed: int = 0, log_every: int = 100):
    """Deterministic AdamW training of the float tiny model. Returns the
    float params pytree (f32 linear weights)."""
    import optax
    from mixq_tensorrt_llm_tpu.models import llama as mllama
    from mixq_tensorrt_llm_tpu.models import common as mcommon

    cfg = tiny_cfg()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(seed))
    params = jax.tree.map(lambda x: x.astype(jnp.float32)
                          if x.dtype == jnp.bfloat16 else x, params)

    warmup = min(max(10, steps // 20), max(1, steps - 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 3e-3, warmup_steps=warmup, decay_steps=max(steps, warmup + 1))
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    n_windows = len(tokens) - SEQ - 1

    @jax.jit
    def step_fn(params, opt_state, key):
        starts = jax.random.randint(key, (batch,), 0, n_windows)
        idx = starts[:, None] + jnp.arange(SEQ + 1)[None, :]
        toks = jnp.take(jnp.asarray(tokens), idx)          # (B, SEQ+1)
        inp, tgt = toks[:, :-1], toks[:, 1:]

        def loss_fn(p):
            b, s = inp.shape
            cache = mcommon.init_kv_cache(cfg, b, s)
            pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
            lens = jnp.full((b,), s, jnp.int32)
            logits, _ = mcommon.forward(p, cfg, inp, pos, cache, lens,
                                        full_prefill=True)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            nll = -jnp.take_along_axis(logp, tgt[..., None], -1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, sub)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"  step {i:4d} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return params, cfg


THRESHOLDS = {          # max relative PPL increase vs float (~2-3x measured)
    "w8a16": 0.005,
    "int8_mix": 0.005,
    "int8_mix_kv8": 0.0075,
    "int4_mix": 0.015,
    "w4a16": 0.02,
    "int8_lr": 0.0075,
    "w4a16_g": 0.025,
}


def run_gate(steps: int = 600, max_blocks=None, num_outliers: int = 32):
    from mixq_tensorrt_llm_tpu.convert.from_float import requantize
    from mixq_tensorrt_llm_tpu.convert.calibrate import calibrate_act_scales
    from mixq_tensorrt_llm_tpu.eval.ppl import evaluate_ppl
    from mixq_tensorrt_llm_tpu.quant.config import (KVCacheQuantAlgo,
                                                    QuantAlgo, QuantConfig)

    toks = corpus_tokens()
    split = int(len(toks) * 0.9)
    train, held = toks[:split], toks[split:]
    print(f"corpus {len(toks):,} bytes, train {split:,}, eval {len(held):,}",
          flush=True)

    print(f"training tiny byte-llama ({steps} steps)...", flush=True)
    params_f, cfg_f = train_tiny(train, steps)

    print("calibrating act scales...", flush=True)
    calib = [train[i * SEQ:(i + 1) * SEQ][None, :] for i in range(16)]
    act_scales = calibrate_act_scales(params_f, cfg_f, calib)

    def quant_cfg(algo, kv=KVCacheQuantAlgo.NONE):
        return QuantConfig(algo=algo, num_outliers=num_outliers, kv_cache=kv)

    schemes = {
        "w8a16": quant_cfg(QuantAlgo.W8A16),
        "int8_mix": quant_cfg(QuantAlgo.INT8_MIX),
        "int8_mix_kv8": quant_cfg(QuantAlgo.INT8_MIX, KVCacheQuantAlgo.INT8),
        "int4_mix": quant_cfg(QuantAlgo.INT4_MIX),
        # plain weight-only int4 — packs two-per-byte BY DEFAULT since r4
        # (commit 910755f changed the storage container; the gate must
        # cover the packed tensors the serving path actually loads)
        "w4a16": quant_cfg(QuantAlgo.W4A16),
        "int8_lr": quant_cfg(QuantAlgo.INT8_LR),
        "w4a16_g": quant_cfg(QuantAlgo.W4A16_G),
    }

    results = {}
    res_f = evaluate_ppl(params_f, cfg_f, held, seq_len=SEQ,
                         max_blocks=max_blocks)
    results["float"] = {"ppl": res_f.ppl}
    print(f"float     ppl {res_f.ppl:8.4f}", flush=True)

    failures = []
    for name, qc in schemes.items():
        params_q, cfg_q = requantize(params_f, cfg_f, qc, act_scales)
        # kv-quant error only reaches the score when attention reads the
        # cache, so the kv8 scheme scores through the cache-attend path
        res = evaluate_ppl(params_q, cfg_q, held, seq_len=SEQ,
                           max_blocks=max_blocks,
                           full_prefill="kv8" not in name)
        delta = res.ppl / res_f.ppl - 1.0
        ok = delta <= THRESHOLDS[name]
        results[name] = {"ppl": res.ppl, "delta_rel": delta,
                         "threshold": THRESHOLDS[name], "pass": bool(ok)}
        print(f"{name:9s} ppl {res.ppl:8.4f}  delta {delta*100:+.2f}% "
              f"(<= {THRESHOLDS[name]*100:.0f}%) "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(name)
    return results, failures


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out", default="PPL_r03.json")
    ap.add_argument("--max_blocks", type=int, default=None)
    args = ap.parse_args()

    results, failures = run_gate(args.steps, args.max_blocks)
    artifact = {
        "gate": "quantized-vs-float block PPL, byte-llama trained on the "
                "repo corpus (deterministic, seed 0)",
        "seq_len": SEQ,
        "train_steps": args.steps,
        "results": results,
        "pass": not failures,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {args.out}; gate {'PASS' if not failures else 'FAIL'}",
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
