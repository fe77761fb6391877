"""AOT multi-chip evidence at 70B scale — no chips, no memory, real HLO.

BASELINE.md's multi-host configs are Llama-2-70B and Qwen2-72B
(/root/reference/mix_qwen_mpi.sh serves Qwen2-72B across ranks). One
chip cannot RUN them, but the compile-time facts that determine scaling
can be produced exactly: `jit.lower()` accepts ShapeDtypeStructs with
NamedShardings, so the full 70B decode step compiles against an 8-device
mesh without materializing a single weight. This tool lowers:

  * Llama-2-70B geometry (GQA kv_heads=8) under tp=8 — the head-sharded
    kernel data plane; kv_heads % tp == 0 holds exactly as the VERDICT
    noted;
  * Qwen2-72B geometry under pp=4 x tp=2 — the reference's own
    demonstrated pp serving config, stage-sharded slabs + nested tp;

and prints per mesh: the collective census (psums per layer at
o_proj/down_proj, zero weight all-gathers), per-device argument bytes,
and whether weights+pool fit a 16 GB-class device. Run on the 8-device
virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/aot_70b.py
"""

import functools
import json
import sys
from pathlib import Path


def main():
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    os.environ.setdefault("MIXQ_PAGED_KERNEL", "force")
    os.environ.setdefault("MIXQ_WRITE_KERNEL", "force")
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from mixq_tensorrt_llm_tpu.models import ModelConfig, common as mcommon
    from mixq_tensorrt_llm_tpu.models.families import init_random_params
    from mixq_tensorrt_llm_tpu.parallel import sharding as psh
    from mixq_tensorrt_llm_tpu.quant import (KVCacheQuantAlgo, QuantAlgo,
                                             QuantConfig)
    from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

    GEOS = {
        "llama2-70b": dict(vocab_size=32000, hidden_size=8192,
                           intermediate_size=28672, num_layers=80,
                           num_heads=64, num_kv_heads=8, head_dim=128),
        "qwen2-72b": dict(vocab_size=152064, hidden_size=8192,
                          intermediate_size=29568, num_layers=80,
                          num_heads=64, num_kv_heads=8, head_dim=128,
                          qkv_bias=True),
    }
    devices = np.array(jax.devices()[:8])
    MESHES = {
        "llama2-70b": ("tp=8", Mesh(devices.reshape(1, 8), ("pp", "tp"))),
        "qwen2-72b": ("pp=4 x tp=2",
                      Mesh(devices.reshape(4, 2), ("pp", "tp"))),
    }
    B, MB, BS = 8, 8, 128

    def abstract_tree(tree, mesh, specs):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=NamedSharding(mesh, psh._strip_absent_axes(s, mesh))),
            tree, specs,
            is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"))

    out = {}
    for name, geo in GEOS.items():
        label, mesh = MESHES[name]
        cfg = ModelConfig(**geo, quant=QuantConfig(
            algo=QuantAlgo.INT8_MIX, num_outliers=128,
            kv_cache=KVCacheQuantAlgo.INT8))
        # tiny-depth REAL init only to harvest the per-tensor shape/dtype
        # tree, then scale the stacked layer axis to full depth abstractly
        small = ModelConfig(**dict(geo, num_layers=2), quant=cfg.quant)
        p_small = init_random_params(small, jax.random.PRNGKey(0))
        L = cfg.num_layers

        def scale_layers(x):
            if hasattr(x, "shape"):
                return jax.ShapeDtypeStruct((L,) + tuple(x.shape[1:]),
                                            x.dtype)
            return x
        params_shape = dict(p_small)
        params_shape["layers"] = jax.tree.map(scale_layers,
                                              p_small["layers"])
        specs = psh.param_specs(params_shape)
        params_abs = abstract_tree(params_shape, mesh, specs)

        nb = B * MB + 1
        st_small = pkv.init_paged_kv(small, 2, BS)
        kv_shape = (L * nb,) + st_small.k.shape[1:]
        sc_shape = (L * nb,) + st_small.k_scale.shape[1:]
        pp = int(mesh.shape["pp"])
        page = "pp" if pp > 1 else None
        st_abs = pkv.PagedKVState(
            k=jax.ShapeDtypeStruct(kv_shape, st_small.k.dtype,
                                   sharding=NamedSharding(
                                       mesh, P(page, "tp", None, None))),
            v=jax.ShapeDtypeStruct(kv_shape, st_small.v.dtype,
                                   sharding=NamedSharding(
                                       mesh, P(page, "tp", None, None))),
            k_scale=jax.ShapeDtypeStruct(sc_shape, jnp.float32,
                                         sharding=NamedSharding(
                                             mesh, P(page, "tp", None))),
            v_scale=jax.ShapeDtypeStruct(sc_shape, jnp.float32,
                                         sharding=NamedSharding(
                                             mesh, P(page, "tp", None))))
        rep = NamedSharding(mesh, P())
        i32 = jnp.int32
        tbl = jax.ShapeDtypeStruct((B, MB), i32, sharding=rep)
        bp = jax.ShapeDtypeStruct((B, MB), i32, sharding=rep)
        ln = jax.ShapeDtypeStruct((B,), i32, sharding=rep)
        tok = jax.ShapeDtypeStruct((B, 1), i32, sharding=rep)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode(params, tokens, state, table, bpos, lens):
            pos = lens[:, None].astype(i32)
            return mcommon.forward_paged(
                params, cfg, tokens, pos, state, table, lens + 1,
                block_pos=bpos, use_kernels=True, mesh=mesh)

        comp = decode.lower(params_abs, tok, st_abs, tbl, bp, ln).compile()
        txt = comp.as_text()
        lines = txt.splitlines()
        n_ar = sum(1 for l in lines if " all-reduce(" in l and "=" in l)
        n_ag = sum(1 for l in lines if " all-gather(" in l and "=" in l)
        n_cp = sum(1 for l in lines
                   if " collective-permute(" in l and "=" in l)
        ma = comp.memory_analysis()
        per_dev_gb = ma.argument_size_in_bytes / 2**30
        out[name] = {
            "mesh": label,
            "all_reduce": n_ar, "all_gather": n_ag,
            "collective_permute": n_cp,
            "per_device_argument_gb": round(per_dev_gb, 2),
            "fits_16gb_per_device": per_dev_gb < 14.0,
        }
        print(f"[{name}] {label}: all_reduce={n_ar} all_gather={n_ag} "
              f"permute={n_cp} per-device args "
              f"{per_dev_gb:.2f} GiB", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
