"""Pipeline-parallel beam BURSTS: the circular microbatch schedule on the
in-graph beam engine.

Round 4 shipped mesh beams, but under a 'pp' mesh every beam step ran the
per-step stage-pipelined forward (models.common.forward_paged_pp) — one
dispatch + relay sync per token, exactly the regime runtime/pp_burst.py
was built to kill for plain decode (r4 VERDICT missing #5). This module
is the beam analogue: requests split into pp GROUPS, and at tick t rank r
runs group (t - r) mod pp at beam step (t - r) / pp through its OWN L/pp
layer slab — steady-state every stage busy, k_eff steps in ONE compiled
call per rank (ticks = k_eff*pp + pp - 1).

What makes beams harder than pp_burst's plain decode is the in-graph
REORDER: each step's top-k chooses parents, and the winning lanes must
adopt their parents' block tables and dense burst tails before the next
step. Under pp those tails are stage-LOCAL (each rank holds only its own
layers' tails), so the reorder must happen on every rank — but only the
last rank computes it. The fix is the same ring that carries activations:
the last rank's reorder vector `rows` hops rank→rank with the token
embedding, and each rank applies group g's step-s reorder exactly at its
own (g, s+1) tick — by construction the moment just before it next
touches that group's state. The final step's reorder (no (g, k_eff) tick
exists) is psum-broadcast once after the loop, before the stage-local
COW + tail-flush epilogue commits each rank's layers' pages.

The reference's beam search runs inside its engine under any topology —
pipelined ranks exchange new tokens over mpi4py per step
(/root/reference/tensorrt_llm/runtime/generation.py:2528-2559 token
broadcast; beam kernels in the same loop). Here the exchange is a
lax.ppermute inside one jitted program: k_eff steps cost ONE dispatch.

Exact equality with the flat (tp/single-chip) burst: the per-layer math,
top-k, reorder and epilogue are the same ops on the same values — only
WHERE they execute differs. tests/test_beam_pp_burst.py pins tokens,
scores and pool state against the flat path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models import common as mcommon
from ..models.common import ModelConfig

NEG_INF = -1e9


def _gsl(a, g0, gl, axis=0):
    return jax.lax.dynamic_slice_in_dim(a, g0, gl, axis)


def pp_burst_supported(cfg: ModelConfig, b: int, pp: int) -> bool:
    """The circular beam burst needs request groups of equal size and the
    plain layer stack (alternating-window / ALiBi archs keep the per-step
    pp plane; the flat burst rejects ALiBi too)."""
    return (b % pp == 0 and mcommon._pattern_period(cfg) == 1
            and cfg.pos_embedding != "alibi")


def make_beam_burst_pp(cfg: ModelConfig, b: int, k: int, k_eff: int,
                       eos: int, use_kernels: bool, do_cow: bool,
                       quantized: bool, mesh, ctrl=None,
                       has_lora: bool = False,
                       compact_flush: bool = False):
    """Build the jitted pp-circular beam burst. Same call contract as the
    flat _make_beam_burst program (beam.py) so _burst_decode_loop swaps it
    in transparently; memoization lives in beam._BURST_FNS (mesh is part
    of the key)."""
    from .beam import (BeamControls, _ban_logits, _flush_tail, _init_tail,
                       _stop_hits)

    pp = int(mesh.shape["pp"])
    tp = int(mesh.shape.get("tp", 1))
    assert pp_burst_supported(cfg, b, pp), (b, pp, cfg.arch)
    nl = cfg.num_layers
    ll = nl // pp
    gb = b // pp                       # requests per group
    gl = gb * k                        # lanes per group
    n_lanes = b * k
    ticks = k_eff * pp + pp - 1
    kernels_ok = use_kernels and (tp == 1 or cfg.num_kv_heads % tp == 0)
    stage_mesh = mesh if (kernels_ok and tp > 1) else None
    hist_w = 0 if ctrl is None else ctrl.hist_w
    rep = P()

    def run(lp_local, other_p, pools, table0, bpos, cur0, prefix_len,
            scores0, fin0, cow_src_own, cow_dst, flush_blk, flush_off,
            hist0, gen0, ctrl_arrs, lora_ids):
        rank = jax.lax.axis_index("pp")
        ring = [(i, (i + 1) % pp) for i in range(pp)]
        nb = pools["k"].shape[0] // ll       # global page count
        c = (None if ctrl is None
             else BeamControls(hist_w, *ctrl_arrs, ctrl.procs))

        # step-0 embeddings for every lane (rank 0 consumes its group's
        # slice at the group's first tick)
        x0 = mcommon._embed(other_p, cfg, cur0[:, None],
                            prefix_len[:, None])            # (N, 1, H)

        def reorder_group(a, rows, g0, apply, axis):
            """Gather group [g0, g0+gl) of lane-axis `axis` by rows
            (group-local), in place; identity when not apply."""
            sl = _gsl(a, g0, gl, axis)
            ro = jnp.take(sl, rows, axis=axis)
            upd = jax.lax.dynamic_update_slice_in_dim(a, ro, g0, axis)
            return jnp.where(apply, upd, a)

        def stage(h, tails_g, s_safe, prefix_g, table_g, bpos_g, lora_g):
            """This rank's ll layers over one group's lanes: attention =
            [read-only pool prefix | dense stage-local tail], the flat
            burst's _forward_with_tail body on the local slab."""
            pos = (prefix_g + s_safe)[:, None].astype(jnp.int32)
            sin, cos, alibi = mcommon._positional_arrays(cfg, pos)
            assert alibi is None

            def body(x, per):
                lp, tail_l, lidx = per
                cache = dict(pools)
                cache.update({f"tail_{n}": v for n, v in tail_l.items()})
                cache["tail_idx"] = s_safe
                x, nc = mcommon.decoder_layer(
                    cfg, lp, x, sin, cos, cache, pos, prefix_g,
                    block_table=table_g + lidx * nb, block_pos=bpos_g,
                    use_kernels=kernels_ok, mesh=stage_mesh,
                    lora_ids=lora_g)
                new_tail = {n[5:]: v for n, v in nc.items()
                            if n.startswith("tail_") and n != "tail_idx"}
                return x, new_tail

            h, new_tails = jax.lax.scan(
                body, h, (lp_local, tails_g,
                          jnp.arange(ll, dtype=jnp.int32)))
            return h, new_tails

        def tick(t, carry):
            (h, rows_msg, tails, table, lane_ids, scores, fin, hist,
             rows_final, toks_b, par_b, sc_b, fin_b) = carry
            gidx = jnp.mod(t - rank, pp)
            s = (t - rank) // pp
            valid = (t >= rank) & (s < k_eff)
            s_safe = jnp.clip(s, 0, k_eff - 1)
            g0 = gidx * gl
            r0 = gidx * gb

            # 1. apply the ring-delivered reorder — group g's step s-1
            # parents, arriving exactly when this rank is about to run
            # step s — to the rank-local lane state
            apply = valid & (s >= 1)
            tails = {n: reorder_group(a, rows_msg, g0, apply, 1)
                     for n, a in tails.items()}
            table = reorder_group(table, rows_msg, g0, apply, 0)
            lane_ids = reorder_group(lane_ids, rows_msg, g0, apply, 0)

            # 2. stage body on the group slice
            prefix_g = _gsl(prefix_len, g0, gl)
            table_g = _gsl(table, g0, gl)
            bpos_g = _gsl(bpos, g0, gl)
            lora_g = None if lora_ids is None else _gsl(lora_ids, g0, gl)
            tails_g = {n: _gsl(a, g0, gl, 1) for n, a in tails.items()}
            fresh = _gsl(x0, g0, gl)
            h_in = jnp.where((rank == 0) & (s_safe == 0), fresh, h)
            h_out, tails_new = stage(h_in, tails_g, s_safe, prefix_g,
                                     table_g, bpos_g, lora_g)
            tails = {n: jnp.where(
                valid, jax.lax.dynamic_update_slice_in_dim(
                    tails[n], tails_new[n], g0, 1), tails[n])
                for n in tails}

            # 3. head + top-k + reorder bookkeeping (true on last rank
            # only; other ranks compute junk that `emit` discards)
            logits = mcommon._head(other_p, cfg, h_out)[:, 0]
            raw = logits.astype(jnp.float32)
            gen_next = gen0 + s_safe + 1
            hist_g = None
            if c is not None:
                c_g = BeamControls(
                    hist_w,
                    *(None if a is None else _gsl(a, g0, gl)
                      for a in (c.min_lanes, c.bw, c.stops, c.stop_len,
                                c.proc_masks)),
                    c.procs)
                hist_g = _gsl(hist, g0, gl)
                raw = _ban_logits(raw, hist_g, c_g, gen_next, eos)
            logp = jax.nn.log_softmax(raw, axis=-1)
            v = logp.shape[-1]
            logp = logp.reshape(gb, k, v)
            scores_g = _gsl(scores, r0, gb)
            fin_g = _gsl(fin, r0, gb)
            cont = jnp.where(fin_g[:, :, None], NEG_INF, logp)
            cont = cont.at[:, :, 0].set(
                jnp.where(fin_g, 0.0, cont[:, :, 0]))
            total = scores_g[:, :, None] + cont
            new_scores_g, idx = jax.lax.top_k(total.reshape(gb, k * v), k)
            parent = idx // v                                # (gb, K)
            token = (idx % v).astype(jnp.int32)
            rows_new = (jnp.arange(gb)[:, None] * k + parent
                        ).reshape(gl).astype(jnp.int32)
            fin_g = jnp.take_along_axis(fin_g, parent, axis=1)
            if eos >= 0:
                fin_g = fin_g | (token == eos)
            if c is not None:
                hist_g = jnp.take(hist_g, rows_new, axis=0)
                hist_g = jnp.concatenate(
                    [hist_g[:, 1:], token.reshape(gl)[:, None]], axis=1)
                sh = _stop_hits(hist_g, c_g, gen_next)
                if sh is not None:
                    fin_g = fin_g | sh.reshape(gb, k)

            emit = valid & (rank == pp - 1)
            scores = jnp.where(emit, jax.lax.dynamic_update_slice(
                scores, new_scores_g, (r0, 0)), scores)
            fin = jnp.where(emit, jax.lax.dynamic_update_slice(
                fin, fin_g, (r0, 0)), fin)
            if c is not None:
                hist = jnp.where(emit, jax.lax.dynamic_update_slice(
                    hist, hist_g, (g0, 0)), hist)
            toks_b = jnp.where(emit, jax.lax.dynamic_update_slice(
                toks_b, token[None], (s_safe, r0, 0)), toks_b)
            par_b = jnp.where(emit, jax.lax.dynamic_update_slice(
                par_b, parent[None], (s_safe, r0, 0)), par_b)
            sc_b = jnp.where(emit, jax.lax.dynamic_update_slice(
                sc_b, new_scores_g[None], (s_safe, r0, 0)), sc_b)
            fin_b = jnp.where(emit, jax.lax.dynamic_update_slice(
                fin_b, fin_g[None], (s_safe, r0, 0)), fin_b)
            # the final step's reorder has no (g, k_eff) tick to ride the
            # ring — bank it for the post-loop broadcast
            rows_final = jnp.where(
                emit & (s == k_eff - 1), jax.lax.dynamic_update_slice(
                    rows_final, rows_new[None], (gidx, 0)), rows_final)

            # 4. ring hop: last rank sends its sample's embedding (due at
            # rank 0 next tick == this group's next step) and its fresh
            # reorder; other ranks forward activations + the reorder
            # unchanged
            emb = mcommon._embed(other_p, cfg, token.reshape(gl)[:, None],
                                 (prefix_g + s_safe + 1)[:, None])
            h_send = jnp.where(rank == pp - 1, emb, h_out)
            rows_send = jnp.where(rank == pp - 1, rows_new, rows_msg)
            h = jax.lax.ppermute(h_send, "pp", ring)
            rows_msg = jax.lax.ppermute(rows_send, "pp", ring)
            return (h, rows_msg, tails, table, lane_ids, scores, fin,
                    hist, rows_final, toks_b, par_b, sc_b, fin_b)

        h0 = jnp.zeros((gl, 1, cfg.hidden_size), cfg.dtype)
        rows0 = jnp.arange(gl, dtype=jnp.int32)
        tails0 = _init_tail(cfg, n_lanes, k_eff, quantized, nl=ll)
        lane_ids0 = jnp.arange(n_lanes, dtype=jnp.int32)
        carry = (h0, rows0, tails0, table0, lane_ids0, scores0, fin0,
                 hist0, jnp.zeros((pp, gl), jnp.int32),
                 jnp.zeros((k_eff, b, k), jnp.int32),
                 jnp.zeros((k_eff, b, k), jnp.int32),
                 jnp.zeros((k_eff, b, k), jnp.float32),
                 jnp.zeros((k_eff, b, k), bool))
        carry = jax.lax.fori_loop(0, ticks, tick, carry)
        (_, _, tails, _, lane_ids, _, _, hist, rows_final,
         toks_b, par_b, sc_b, fin_b) = carry

        # final-step reorder: broadcast from the last rank, apply to the
        # stage-local tails + ancestry so the epilogue flushes the
        # burst-FINAL lanes (host flush_blk is indexed by final lane)
        zero = jnp.zeros_like(rows_final)
        rows_final = jax.lax.psum(
            jnp.where(rank == pp - 1, rows_final, zero), "pp")
        t_ = jnp.bool_(True)
        for g in range(pp):
            tails = {n: reorder_group(a, rows_final[g], g * gl, t_, 1)
                     for n, a in tails.items()}
            lane_ids = reorder_group(lane_ids, rows_final[g], g * gl,
                                     t_, 0)

        # stage-local epilogue: COW + tail flush into this rank's own
        # layers' pages (local pool rows j*nb + page, j in [0, ll))
        lrows = jnp.arange(ll, dtype=jnp.int32)[:, None] * nb
        if do_cow:
            src_blk = jnp.take(cow_src_own, lane_ids)
            src_r = (lrows + src_blk[None, :]).reshape(-1)
            dst_r = (lrows + cow_dst[None, :]).reshape(-1)
            pools2 = {n: p.at[dst_r].set(p[src_r])
                      for n, p in pools.items()}
        else:
            pools2 = dict(pools)
        rows = (jnp.arange(ll, dtype=jnp.int32)[:, None, None] * nb
                + flush_blk[None])                           # (ll, N, k)
        offs = jnp.broadcast_to(flush_off[None], rows.shape)
        pools2 = _flush_tail(pools2, tails, rows, offs,
                             compact=compact_flush)

        # replicate the last rank's outputs (masked psum: single nonzero
        # contributor, exact)
        def bcast(a, dt=None):
            masked = jnp.where(rank == pp - 1, a, jnp.zeros_like(
                a, dtype=dt or a.dtype))
            if a.dtype == jnp.bool_:
                return jax.lax.psum(masked.astype(jnp.int32), "pp") > 0
            return jax.lax.psum(masked, "pp")

        toks_b = bcast(toks_b)
        par_b = bcast(par_b)
        sc_b = bcast(sc_b)
        fin_b = bcast(fin_b)
        if hist is not None:
            hist = bcast(hist)
        cur = toks_b[k_eff - 1].reshape(n_lanes)
        return cur, sc_b, fin_b, par_b, toks_b, hist, pools2

    @functools.partial(jax.jit, donate_argnums=(1,))
    def burst_fn(params, pools, table0, bpos, cur0, prefix_len, scores0,
                 fin0, cow_src_own, cow_dst, flush_blk, flush_off, hist0,
                 gen0, ctrl_arrs, lora_ids):
        layer_params = params["layers"]
        other = {k_: v for k_, v in params.items() if k_ != "layers"}
        pool_specs = {k_: P("pp") for k_ in pools}
        args = (layer_params, other, pools, table0, bpos, cur0,
                prefix_len, scores0, fin0, cow_src_own, cow_dst,
                flush_blk, flush_off, hist0, gen0, ctrl_arrs, lora_ids)
        specs = (jax.tree.map(lambda _: P("pp"), layer_params),
                 jax.tree.map(lambda _: rep, other), pool_specs,
                 *(jax.tree.map(lambda _: rep, a) for a in args[3:]))
        out_specs = (rep, rep, rep, rep, rep,
                     jax.tree.map(lambda _: rep, hist0), pool_specs)
        run_sm = jax.shard_map(run, mesh=mesh, in_specs=specs,
                               out_specs=out_specs,
                               axis_names=frozenset({"pp"}),
                               check_vma=False)
        return run_sm(*args)

    return burst_fn
