"""Scaling-efficiency harness: decode throughput vs mesh size.

SURVEY §7.7 / BASELINE north star "≥85% scaling efficiency at ≥2 hosts":
runs the SAME decode workload over tp = 1, 2, ... meshes (weights
column/row-sharded, paged pools sharded on the KV-head axis — the
Executor(mesh=) path) and reports tokens/s plus efficiency vs the
single-device run scaled by the mesh size.

On this environment only one TPU chip (or a virtual CPU mesh) exists, so
the harness is validated functionally here and produces meaningful
efficiency numbers on a real slice:

    python tools/scaling_bench.py --tp 1 2 4 --layers 4 [--cpu]

CPU mode forces an 8-device virtual host platform (numbers indicate the
harness works, not hardware efficiency).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv_heads", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--gen", type=int, default=16)
    ap.add_argument("--dp", type=int, nargs="*", default=[],
                    help="WEAK-scaling rows over dp lane groups: batch "
                         "scales as dp x --batch so lanes/device stay "
                         "constant — step time should hold ~flat (the "
                         "dp kernel plane has zero collectives in the "
                         "step; r4 VERDICT missing #3 'Done' criterion)")
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        # exercise the shard_map'd Pallas data plane (interpret mode) —
        # the same routing a real multi-chip TPU mesh takes
        os.environ.setdefault("MIXQ_PAGED_KERNEL", "force")
        os.environ.setdefault("MIXQ_WRITE_KERNEL", "force")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

    devices = jax.devices()
    cfg = ModelConfig(vocab_size=1024, hidden_size=args.hidden,
                      intermediate_size=2 * args.hidden,
                      num_layers=args.layers, num_heads=args.heads,
                      num_kv_heads=args.kv_heads,
                      head_dim=args.hidden // args.heads,
                      max_position_embeddings=256)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, 16).tolist()
               for _ in range(args.batch)]

    results = {}
    for tp in args.tp:
        if tp > len(devices):
            print(f"skip tp={tp}: only {len(devices)} devices",
                  file=sys.stderr)
            continue
        mesh = (None if tp == 1 else
                Mesh(np.array(devices[:tp]), ("tp",)))
        ex = Executor(params, cfg, max_batch=args.batch, max_seq_len=64,
                      block_size=8, prefill_chunk=16, mesh=mesh, seed=0)
        planes = results.setdefault("_plane", {})
        planes[tp] = ("pallas-shard_map" if ex._use_kernels
                      else "jnp-gspmd")
        for p in prompts:                       # warm compile
            ex.submit(p, max_new_tokens=2)
        ex.run()
        rids = [ex.submit(p, max_new_tokens=args.gen) for p in prompts]
        t0 = time.perf_counter()
        done = ex.run()
        wall = time.perf_counter() - t0
        toks = sum(len(done[r].generated) for r in rids)
        results[tp] = toks / wall
        print(f"tp={tp}: {results[tp]:.1f} tok/s", file=sys.stderr,
              flush=True)

    for dp in args.dp:
        if dp > len(devices):
            print(f"skip dp={dp}: only {len(devices)} devices",
                  file=sys.stderr)
            continue
        mesh = (None if dp == 1 else
                Mesh(np.array(devices[:dp]).reshape(dp, 1), ("dp", "tp")))
        b = args.batch * dp            # lanes/device held constant
        dprompts = [rng.integers(1, cfg.vocab_size, 16).tolist()
                    for _ in range(b)]
        ex = Executor(params, cfg, max_batch=b, max_seq_len=64,
                      block_size=8, prefill_chunk=16, mesh=mesh, seed=0)
        for p in dprompts:
            ex.submit(p, max_new_tokens=2)
        ex.run()
        rids = [ex.submit(p, max_new_tokens=args.gen) for p in dprompts]
        t0 = time.perf_counter()
        done = ex.run()
        wall = time.perf_counter() - t0
        toks = sum(len(done[r].generated) for r in rids)
        row = {"lanes": b, "tok_s": round(toks / wall, 1),
               "ms_per_step": round(wall / args.gen * 1e3, 1),
               "plane": ("pallas-shard_map" if ex._use_kernels
                         else "jnp-gspmd")}
        results[f"dp={dp}"] = row
        print(f"dp={dp} ({b} lanes): {row['tok_s']} tok/s, "
              f"{row['ms_per_step']} ms/step [{row['plane']}]",
              file=sys.stderr, flush=True)

    # compile-time scaling evidence from the REAL compiles (r3 VERDICT
    # next-round #8; the runtime numbers above are one-host): collective
    # census + per-device argument bytes of the tp decode step. The >=85%
    # scaling north star requires exactly 2 psums/layer (o_proj/down_proj,
    # the reference's NCCL allreduce points), no weight all-gathers, and
    # per-device bytes ~ 1/tp. tests/test_hlo_collectives.py pins these;
    # here they are reported from this geometry's actual programs.
    import functools
    import jax.numpy as jnp
    from mixq_tensorrt_llm_tpu.models import common as mcommon
    from mixq_tensorrt_llm_tpu.parallel import sharding as psh
    from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

    def hlo_facts(tp):
        mesh = (None if tp == 1 else Mesh(np.array(devices[:tp]), ("tp",)))
        p = params if mesh is None else psh.shard_params(params, mesh)
        st = pkv.init_paged_kv(cfg, 16, 8)
        if mesh is not None:
            st = psh.shard_paged_state(st, mesh)
        B, MB = args.batch, 8
        tbl = jnp.zeros((B, MB), jnp.int32)
        bp = jnp.zeros((B, MB), jnp.int32)
        ln = jnp.full((B,), 9, jnp.int32)
        tok = jnp.ones((B, 1), jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode(p, tok, st, tbl, bp, ln):
            return mcommon.forward_paged(
                p, cfg, tok, ln[:, None].astype(jnp.int32), st, tbl,
                ln + 1, block_pos=bp, use_kernels=True, mesh=mesh)

        comp = decode.lower(p, tok, st, tbl, bp, ln).compile()
        txt = comp.as_text()
        lines = txt.splitlines()
        n_ar = sum(1 for l in lines if " all-reduce(" in l and "=" in l)
        n_ag = sum(1 for l in lines if " all-gather(" in l and "=" in l)
        return {"all_reduce": n_ar, "all_gather": n_ag,
                "arg_bytes_per_device":
                    comp.memory_analysis().argument_size_in_bytes}

    hlo = {str(tp): hlo_facts(tp) for tp in args.tp
           if tp <= len(devices)}

    planes = results.pop("_plane", {})
    base_tp = min(results)
    out = {"tok_s": {str(k): round(v, 1) for k, v in results.items()},
           "efficiency_vs_linear": {
               str(k): round(v / (results[base_tp] * (k / base_tp)), 3)
               for k, v in results.items()},
           "data_plane": {str(k): v for k, v in planes.items()},
           "step_hlo": hlo,
           "note": ("virtual CPU mesh — functional validation only"
                    if args.cpu else "hardware mesh")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
