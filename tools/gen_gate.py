"""Standing GENERATION gate: quantized-vs-float greedy continuations.

PPL alone can miss decode-path regressions (it scores teacher-forced
blocks); this gate mirrors the reference's ROUGE discipline
(summarize.py:700-708: TRT-vs-HF ROUGE-1 threshold checked at eval end)
on the same deterministic byte-llama as tools/ppl_gate.py: greedy-generate
continuations of held-out corpus prompts under each quantization scheme
and score them against the float model's continuations with

  * unigram F1 (the ROUGE-1 analogue on byte tokens), and
  * mean exact-match prefix length (decode-path bit-level agreement).

Thresholds bracket round-3 measured behavior at ~2-3x headroom (r2 VERDICT
weak #6: thresholds must bracket measurement, not folklore).

Run: python tools/gen_gate.py [--steps N] [--out GEN_r03.json]
Writes the JSON artifact and exits nonzero on violation.
"""

import argparse
import json
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# NOTE: the persistent compilation cache is enabled in main() only — doing
# it at import time opted the TEST process into the shared cache, and a
# concurrent writer (another gate run) segfaulted a cache read mid-suite

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "ppl_gate", Path(__file__).resolve().parent / "ppl_gate.py")
ppl_gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ppl_gate)

N_PROMPTS = 16
PROMPT_LEN = 64
GEN_LEN = 48

# minimum acceptable (unigram_f1, mean_exact_prefix) vs float
# round-3 measured (1200 steps, seed 0): w8a16 (0.898, 30.4),
# int8_mix (0.905, 37.3), kv8 (0.898, 31.4), int4_mix (0.703, 12.6),
# int8_lr (0.882, 26.9), w4a16_g (0.753, 16.6). Floors sit at roughly
# measured-F1 minus 0.1 and half the measured prefix — greedy
# continuations diverge chaotically after the first flipped argmax, so
# per-seed variance is real; a genuine decode regression craters both.
THRESHOLDS = {
    "w8a16": (0.80, 15.0),
    "int8_mix": (0.80, 18.0),
    "int8_mix_kv8": (0.80, 15.0),
    "int4_mix": (0.60, 6.0),
    "w4a16": (0.60, 6.0),
    "int8_lr": (0.78, 13.0),
    "w4a16_g": (0.65, 8.0),
}


def unigram_f1(a, b) -> float:
    """ROUGE-1-style F1 on token multisets."""
    from collections import Counter
    ca, cb = Counter(a), Counter(b)
    overlap = sum((ca & cb).values())
    if not overlap:
        return 0.0
    p, r = overlap / max(len(b), 1), overlap / max(len(a), 1)
    return 2 * p * r / (p + r)


def exact_prefix(a, b) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def run_gate(steps: int = 1200):
    from mixq_tensorrt_llm_tpu.convert.from_float import requantize
    from mixq_tensorrt_llm_tpu.convert.calibrate import calibrate_act_scales
    from mixq_tensorrt_llm_tpu.runtime.session import GenerationSession
    from mixq_tensorrt_llm_tpu.quant.config import (KVCacheQuantAlgo,
                                                    QuantAlgo, QuantConfig)

    toks = ppl_gate.corpus_tokens()
    split = int(len(toks) * 0.9)
    train, held = toks[:split], toks[split:]
    print(f"training byte-llama ({steps} steps)...", flush=True)
    params_f, cfg_f = ppl_gate.train_tiny(train, steps)
    calib = [train[i * ppl_gate.SEQ:(i + 1) * ppl_gate.SEQ][None, :]
             for i in range(16)]
    act_scales = calibrate_act_scales(params_f, cfg_f, calib)

    rng = np.random.default_rng(0)
    starts = rng.integers(0, len(held) - PROMPT_LEN - 1, N_PROMPTS)
    prompts = [held[s:s + PROMPT_LEN].tolist() for s in starts]

    def generate(params, cfg):
        sess = GenerationSession(params, cfg,
                                 max_seq_len=PROMPT_LEN + GEN_LEN + 8,
                                 prefill_buckets=(PROMPT_LEN,))
        seqs = sess.generate(prompts, max_new_tokens=GEN_LEN).sequences
        return [s[PROMPT_LEN:] for s in seqs]

    ref = generate(params_f, cfg_f)

    def quant_cfg(algo, kv=KVCacheQuantAlgo.NONE):
        return QuantConfig(algo=algo, num_outliers=32, kv_cache=kv)

    schemes = {
        "w8a16": quant_cfg(QuantAlgo.W8A16),
        "int8_mix": quant_cfg(QuantAlgo.INT8_MIX),
        "int8_mix_kv8": quant_cfg(QuantAlgo.INT8_MIX, KVCacheQuantAlgo.INT8),
        "int4_mix": quant_cfg(QuantAlgo.INT4_MIX),
        # packed-by-default weight-only int4 (storage changed r4)
        "w4a16": quant_cfg(QuantAlgo.W4A16),
        "int8_lr": quant_cfg(QuantAlgo.INT8_LR),
        "w4a16_g": quant_cfg(QuantAlgo.W4A16_G),
    }

    results, failures = {}, []
    for name, qc in schemes.items():
        params_q, cfg_q = requantize(params_f, cfg_f, qc, act_scales)
        gen = generate(params_q, cfg_q)
        f1 = float(np.mean([unigram_f1(r, g) for r, g in zip(ref, gen)]))
        pref = float(np.mean([exact_prefix(r, g)
                              for r, g in zip(ref, gen)]))
        f1_min, pref_min = THRESHOLDS[name]
        ok = f1 >= f1_min and pref >= pref_min
        results[name] = {"unigram_f1": round(f1, 4),
                         "mean_exact_prefix": round(pref, 2),
                         "f1_min": f1_min, "prefix_min": pref_min,
                         "pass": bool(ok)}
        print(f"{name:13s} f1 {f1:.4f} (>= {f1_min})  "
              f"prefix {pref:5.1f} (>= {pref_min}) "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(name)
    return results, failures


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out", default="GEN_r03.json")
    args = ap.parse_args()
    results, failures = run_gate(args.steps)
    artifact = {
        "gate": "quantized-vs-float greedy continuations on the byte "
                "corpus (unigram F1 + exact prefix), deterministic seed 0",
        "prompts": N_PROMPTS, "prompt_len": PROMPT_LEN, "gen_len": GEN_LEN,
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
