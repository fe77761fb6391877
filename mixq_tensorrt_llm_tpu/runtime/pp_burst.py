"""Pipeline-parallel decode BURSTS: the circular microbatch schedule on
the paged executor.

forward_paged_pp (models/common.py) serves correctly under a 'pp' mesh but
runs stages sequentially inside each step — every rank does L/pp x pp = L
layers of work per step, so throughput equals a single full-depth chip
(memory is the only win). This module is the compute fix for burst decode:
the executor's lanes split into pp MICROBATCH GROUPS, and at tick t rank r
processes group (t - r) mod pp at decode step (t - r) / pp — in steady
state every stage does useful work every tick, so a k-step burst costs
k*pp + pp - 1 ticks of L/pp-layer work per rank: utilization k/(k+1)
instead of 1/pp.

The schedule is parallel/pipeline.pp_generate's circular ring, rebuilt on
the paged pools with the executor's full sampler: the last stage samples a
group's next token (per-lane SamplingParams, history/repetition window,
eos suppression, bad words, named processors), EMBEDS it, and the same
lax.ppermute that hops activations delivers the embedding to stage 0
exactly when that group's next step is due — the reference's mpi4py token
broadcast (generation.py:2528-2559), dissolved into the data path.

Invalid (fill/drain) ticks execute uniformly on every rank — collectives
must not sit under rank-diverging control flow (measured deadlock,
models/common.forward_paged_pp) — with their page writes redirected to
the trash block (kv_valid_len = 0 masks them): drain ticks run AFTER a
position's real write, so forward_paged_pp's overwritten-before-read
argument does not cover them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models import common as mcommon
from ..models.common import ModelConfig
from .kv_cache import PagedKVState
from .sampler import sample_batched


def make_pp_decode_burst(cfg: ModelConfig, mesh, k_steps: int,
                         max_batch: int, win_tokens: int, sink_tokens: int,
                         use_kernels: bool, apply_procs=None):
    """Build the jitted pp-circular burst program.

    Returned fn has the single-device burst_fn's contract —
    (params, tokens (B,1), state, table, bpos, lens, key, samp, history,
    sup_tok, min_left, lora, bad_words=None, proc_masks=None) ->
    (tokens (B,k), logprobs (B,k), state) — so the executor swaps it in
    transparently.
    """
    pp = int(mesh.shape["pp"])
    tp = int(mesh.shape.get("tp", 1))
    assert max_batch % pp == 0, \
        f"pp burst needs max_batch ({max_batch}) divisible by pp ({pp})"
    gsz = max_batch // pp
    ll = cfg.num_layers // pp
    pat = mcommon._pattern_period(cfg)
    assert pat == 1 or ll % pat == 0
    # pp x tp: stage bodies run the kernels per (stage, head-shard) via the
    # nested tp shard_map (parallel/kernel_shard._resolve_mesh) — the same
    # plane forward_paged_pp serves; tp stays auto for the linears/psums
    kernels_ok = use_kernels and (tp == 1 or cfg.num_kv_heads % tp == 0)
    stage_mesh = mesh if (kernels_ok and tp > 1) else None
    ticks = k_steps * pp + pp - 1
    rep = P()

    def gslice(a, gidx, axis=0):
        return jax.lax.dynamic_slice_in_dim(a, gidx * gsz, gsz, axis)

    def run(lp_local, other_p, pools, tok0, table, bpos, lens, key, samp,
            history0, sup_tok, min_left0, lora, bw, pm):
        rank = jax.lax.axis_index("pp")
        ring = [(i, (i + 1) % pp) for i in range(pp)]
        has_bw = bw.shape[1] > 0
        has_pm = pm.shape[0] > 0

        # step-0 embeddings for every group, precomputed: (pp, gsz, 1, H)
        x0 = mcommon._embed(other_p, cfg, tok0[:, None],
                            lens[:, None]).reshape(pp, gsz, 1, -1)

        def samp_slice(gidx):
            return jax.tree.map(
                lambda a: gslice(a, gidx)
                if getattr(a, "ndim", 0) >= 1 and a.shape[0] == max_batch
                else a, samp)

        def stage(h, pools, wp, kvl, table_g, bpos_g, lora_g):
            local_nb = pools["k"].shape[0] // ll
            sin, cos, alibi = mcommon._positional_arrays(cfg, wp)

            def body(carry, per):
                h, pools = carry
                gp, lidx = per
                for j in range(pat):
                    li = lidx[j] if pat > 1 else lidx
                    h, nc = mcommon.decoder_layer(
                        cfg, mcommon._group_slice(gp, j, pat), h, sin, cos,
                        dict(pools), wp, kvl,
                        block_table=table_g + li * local_nb,
                        block_pos=bpos_g, window=win_tokens,
                        sink=sink_tokens, alibi=alibi, lora_ids=lora_g,
                        layer_window=cfg.layer_window(j),
                        use_kernels=kernels_ok, mesh=stage_mesh)
                    pools = nc
                return (h, pools), None

            lidx = jnp.arange(ll, dtype=jnp.int32)
            if pat > 1:
                lidx = lidx.reshape(ll // pat, pat)
            (h, pools), _ = jax.lax.scan(
                body, (h, pools), (mcommon._group(lp_local, pat), lidx))
            return h, pools

        def tick(t, carry):
            h, pools, toks, lps, history, min_left = carry
            gidx = jnp.mod(t - rank, pp)
            s = (t - rank) // pp
            valid = (t >= rank) & (s < k_steps)
            s_safe = jnp.clip(s, 0, k_steps - 1)

            lens_g = gslice(lens, gidx)
            wp = (lens_g + s_safe)[:, None].astype(jnp.int32)
            # invalid ticks mask ALL page writes to the trash block
            kvl = jnp.where(valid, lens_g + s_safe + 1, 0).astype(jnp.int32)
            table_g = gslice(table, gidx)
            bpos_g = gslice(bpos, gidx)
            lora_g = gslice(lora, gidx)

            fresh = jax.lax.dynamic_index_in_dim(x0, gidx, 0,
                                                 keepdims=False)
            h_in = jnp.where((rank == 0) & (s_safe == 0), fresh, h)
            h_out, pools = stage(h_in, pools, wp, kvl, table_g, bpos_g,
                                 lora_g)

            # --- last stage: head + full sampler for this group's step ---
            logits = mcommon._head(other_p, cfg, h_out)[:, 0]   # (gsz, V)
            hist_g = gslice(history, gidx)
            if apply_procs is not None and has_pm:
                logits = apply_procs(logits, hist_g, gslice(pm, gidx, 1))
            ml_g = gslice(min_left, gidx)
            tok = sample_batched(
                logits, jax.random.fold_in(key, t), samp_slice(gidx),
                history=hist_g, suppress_token=gslice(sup_tok, gidx),
                suppress_flag=(ml_g > 0).astype(jnp.int32),
                bad_words=gslice(bw, gidx) if has_bw else None)
            lp = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                                     tok[:, None], axis=-1)[:, 0]

            emit = valid & (rank == pp - 1)
            toks = jnp.where(emit, jax.lax.dynamic_update_slice(
                toks, tok[:, None], (gidx * gsz, s_safe)), toks)
            lps = jnp.where(emit, jax.lax.dynamic_update_slice(
                lps, lp[:, None], (gidx * gsz, s_safe)), lps)
            new_hist = jnp.concatenate([hist_g[:, 1:], tok[:, None]],
                                       axis=1)
            history = jnp.where(
                emit, jax.lax.dynamic_update_slice(history, new_hist,
                                                   (gidx * gsz, 0)),
                history)
            min_left = jnp.where(
                emit, jax.lax.dynamic_update_slice(
                    min_left, jnp.maximum(ml_g - 1, 0), (gidx * gsz,)),
                min_left)

            # feedback: the last stage embeds its sample; the ring hop
            # delivers it to stage 0 exactly when step s+1 is due
            h_send = jnp.where(
                rank == pp - 1,
                mcommon._embed(other_p, cfg, tok[:, None],
                               (lens_g + s_safe + 1)[:, None]),
                h_out)
            h = jax.lax.ppermute(h_send, "pp", ring)
            return h, pools, toks, lps, history, min_left

        h0 = jnp.zeros((gsz, 1, cfg.hidden_size), cfg.dtype)
        toks0 = jnp.zeros((max_batch, k_steps), jnp.int32)
        lps0 = jnp.zeros((max_batch, k_steps), jnp.float32)
        carry = (h0, pools, toks0, lps0, history0, min_left0)
        carry = jax.lax.fori_loop(0, ticks, tick, carry)
        _, pools, toks, lps, _, _ = carry
        toks = jax.lax.psum(jnp.where(rank == pp - 1, toks,
                                      jnp.zeros_like(toks)), "pp")
        lps = jax.lax.psum(jnp.where(rank == pp - 1, lps,
                                     jnp.zeros_like(lps)), "pp")
        return toks, lps, pools

    @functools.partial(jax.jit, donate_argnums=(2,))
    def burst_fn(params, tokens, state, block_table, block_pos, lens, key,
                 samp, history, sup_tok, min_left, lora_ids,
                 bad_words=None, proc_masks=None):
        pools = {"k": state.k, "v": state.v}
        if state.quantized:
            pools.update(k_scale=state.k_scale, v_scale=state.v_scale)
        pool_specs = {k: P("pp") for k in pools}
        layer_params = params["layers"]
        other = {k: v for k, v in params.items() if k != "layers"}
        # dummy 0-width stand-ins keep the shard_map arg tree static when
        # the optional logits controls are absent (shape-based switch)
        bw = (bad_words if bad_words is not None
              else jnp.full((max_batch, 0, 2), 0, jnp.int32))
        pm = (proc_masks if proc_masks is not None
              else jnp.zeros((0, max_batch), bool))
        layer_specs = jax.tree.map(lambda _: P("pp"), layer_params)
        other_specs = jax.tree.map(lambda _: P(), other)
        samp_specs = jax.tree.map(lambda _: P(), samp)
        run_sm = jax.shard_map(
            run, mesh=mesh,
            in_specs=(layer_specs, other_specs, pool_specs, rep, rep, rep,
                      rep, rep, samp_specs, rep, rep, rep, rep, rep, rep),
            out_specs=(rep, rep, pool_specs),
            axis_names=frozenset({"pp"}),
            check_vma=False)
        toks, lps, pools = run_sm(
            layer_params, other, pools, tokens[:, 0], block_table,
            block_pos, lens, key, samp, history, sup_tok, min_left,
            lora_ids, bw, pm)
        new_state = PagedKVState(
            k=pools["k"], v=pools["v"], k_scale=pools.get("k_scale"),
            v_scale=pools.get("v_scale"))
        return toks, lps, new_state

    return burst_fn
