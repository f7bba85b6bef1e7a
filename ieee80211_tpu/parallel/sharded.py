"""Sharded PHY computation over a device mesh.

TPU-native replacement for the reference's scaling story (SURVEY.md §2.5):

  * front-end correlators run over *time-sharded* captures with an
    overlap-save halo exchanged via `ppermute` over ICI (the reference
    instead streams chunks through a thread pipeline with ring buffers);
  * packet decode is *batch-sharded* (dp) — the reference's analog is
    running multiple flowgraph processes;
  * demodulated soft bits / decoded bits are regrouped with collectives
    (psum/all_gather) instead of UDP sockets.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.pipeline import make_rx_step
from ..ops import sync
from ..specs import Mod

HALO = 31  # lag (16) + window (16) - 1 of the STF auto-correlator


def sharded_frontend(mesh, x2):
    """STF auto-correlation of a time-sharded capture with halo exchange.

    x2: [B, T, 2] float32 I/Q with B sharded over 'dp' and T sharded over
    'sp'. Each time shard pulls HALO samples from its right neighbor over
    ICI (ppermute) so the sliding correlator is seamless across shard
    boundaries (overlap-save; SURVEY.md §5 "long-context" equivalent).
    Returns ac: [B, T] (last HALO samples of the capture are zero).
    """
    from ..utils.riq import r2c
    n_sp = mesh.shape["sp"]

    @partial(jax.shard_map, mesh=mesh, in_specs=P("dp", "sp", None),
             out_specs=P("dp", "sp"))
    def local(xb2):
        left_edge = xb2[:, :HALO]
        perm = [(i, (i - 1) % n_sp) for i in range(n_sp)]
        halo = jax.lax.ppermute(left_edge, "sp", perm)
        ext = r2c(jnp.concatenate([xb2, halo], axis=1))
        ac = sync.stf_autocorr(ext)
        # zero the wrapped-around tail on the last shard
        idx = jax.lax.axis_index("sp")
        tail_invalid = (jnp.arange(xb2.shape[1]) >= xb2.shape[1] - HALO) \
            & (idx == n_sp - 1)
        return jnp.where(tail_invalid[None, :], 0.0, ac[:, :xb2.shape[1]])

    if isinstance(x2, jax.core.Tracer):
        return local(x2)         # inside jit: mesh comes from in_shardings
    with jax.set_mesh(mesh):     # eager call: establish the mesh context
        return local(x2)


def sharded_rx(mesh, mod: Mod, n_sym: int):
    """Batch-sharded fixed-config RX step: packets split over 'dp'."""
    step = make_rx_step(mod, n_sym)
    in_shard = NamedSharding(mesh, P(("dp", "sp"), None, None))
    t_shard = NamedSharding(mesh, P(("dp", "sp")))

    @partial(jax.jit, in_shardings=(in_shard, t_shard))
    def run(x2, t0):
        return step(x2, t0)

    return run


def _local_triggers(ac: jnp.ndarray, k: int, thresh: float = 0.5,
                    plateau: int = 20, min_gap: int = 400) -> jnp.ndarray:
    """Fixed-capacity in-graph trigger: rising edges of >=plateau runs of
    ac > thresh, min_gap-deduped. ac: [B, Ta] -> t [B, k] int32 ascending,
    invalid slots = Ta (one-past-end sentinel).

    Parity with the host/native trigger (lib/trigger_impl.cc:75-110,
    ops/sync.find_triggers_np) but jit-compatible: the run-length counter
    becomes a moving-sum threshold + rising-edge mask, the sequential
    min_gap suppression a K-step scan (K is small and static).
    """
    ta = ac.shape[-1]
    above = ac > thresh
    runp = sync._movsum(above.astype(jnp.float32), plateau) > plateau - 0.5
    prev = jnp.concatenate([jnp.zeros_like(above[:, :1]), above[:, :-1]],
                           axis=1)[:, :runp.shape[1]]
    rise = runp & ~prev                                     # [B, Ta-p+1]
    big = jnp.int32(ta)

    def one_row(r):
        (idx,) = jnp.nonzero(r, size=k, fill_value=ta)
        idx = idx.astype(jnp.int32)
        def f(last, t):
            keep = (t - last >= min_gap) & (t < ta)
            return jnp.where(keep, t, last), jnp.where(keep, t, big)
        # init derived from data so its varying-axes set matches inside
        # shard_map (scan carry in/out vma must agree)
        _, out = jax.lax.scan(f, jnp.int32(-min_gap) + idx[0] * 0, idx)
        return out

    return jax.vmap(one_row)(rise)


def sharded_capture_decode(mesh, mod: Mod, n_sym: int, window_len: int,
                           k_per_shard: int = 4):
    """The CLOSED sharded capture->decode loop, one XLA program:

      sp-sharded front-end (STF autocorr with ppermute halo)
        -> in-graph trigger (fixed capacity k per time shard; a packet
           belongs to the shard containing its trigger)
        -> window extraction with a right halo of a full window length, so
           packets straddling shard edges decode seamlessly (overlap-save;
           SURVEY.md §7 "halo correctness")
        -> all_gather regroup of the windows over ICI (the soft-bit/window
           redistribution the reference does with ring buffers + UDP)
        -> load-balanced decode: shard i decodes windows j = i mod n_sp,
           so unevenly distributed triggers still spread over the mesh
        -> all_gather of decoded bits (replicated out).

    Returns run(capture[B, T, 2] f32 I/Q; B over dp, T over sp) -> dict:
      bits [B, n_win, n_bits], trig_t [B, n_win] (global sample index,
      T = invalid slot), ok [B, n_win] (valid trigger & L-SIG-consistent
      decode), cfo [B, n_win].
    """
    step = make_rx_step(mod, n_sym)
    n_sp = mesh.shape["sp"]
    w = window_len
    cap_shard = NamedSharding(mesh, P("dp", "sp", None))

    # check_vma=False: outputs ARE replicated over 'sp' (they are produced
    # by all_gather over 'sp'), but the varying-axes checker cannot infer
    # replication through the gather+reshape; the parity tests in
    # tests/test_sharded_capture.py prove the replication invariant.
    @partial(jax.shard_map, mesh=mesh, in_specs=P("dp", "sp", None),
             out_specs=(P("dp", None, None), P("dp", None), P("dp", None),
                        P("dp", None)), check_vma=False)
    def local(xb2):
        from ..utils.riq import r2c
        b, tl, _ = xb2.shape
        idx = jax.lax.axis_index("sp")
        perm = [(i, (i - 1) % n_sp) for i in range(n_sp)]
        halo = jax.lax.ppermute(xb2[:, :w], "sp", perm)     # right halo
        ext = jnp.concatenate([xb2, halo], axis=1)          # [B, Tl+w, 2]
        ac = sync.stf_autocorr(r2c(ext))
        # wrapped halo on the last shard is invalid: zero its tail ac
        tail = (jnp.arange(ac.shape[1]) >= tl) & (idx == n_sp - 1)
        ac = jnp.where(tail[None, :], 0.0, ac)
        t_loc = _local_triggers(ac[:, :tl], k_per_shard)    # [B, k]
        valid = t_loc < tl
        t_safe = jnp.minimum(t_loc, tl)
        wins = jax.vmap(                                     # [B, k, w, 2]
            lambda row, ts: jax.vmap(
                lambda t: jax.lax.dynamic_slice(
                    row, (t, 0), (w, 2)))(ts))(ext, t_safe)
        t_glob = jnp.where(valid, t_loc + idx * tl, n_sp * tl)

        # regroup: every shard sees all windows, decodes its strided share
        wins_all = jax.lax.all_gather(wins, "sp")            # [n_sp,B,k,w,2]
        val_all = jax.lax.all_gather(valid, "sp")
        tg_all = jax.lax.all_gather(t_glob, "sp")
        wins_all = jnp.moveaxis(wins_all, 0, 1).reshape(b, n_sp * k_per_shard,
                                                        w, 2)
        val_all = jnp.moveaxis(val_all, 0, 1).reshape(b, -1)
        tg_all = jnp.moveaxis(tg_all, 0, 1).reshape(b, -1)
        # sort by global time so output slots are capture-ordered
        order = jnp.argsort(tg_all, axis=1)
        wins_all = jnp.take_along_axis(
            wins_all, order[:, :, None, None], axis=1)
        val_all = jnp.take_along_axis(val_all, order, axis=1)
        tg_all = jnp.take_along_axis(tg_all, order, axis=1)

        mine = jnp.take(wins_all.reshape(b, k_per_shard, n_sp, w, 2),
                        idx, axis=2)                         # [B, k, w, 2]
        out = step(mine.reshape(b * k_per_shard, w, 2),
                   jnp.zeros(b * k_per_shard, jnp.int32))
        bits = out["bits"].reshape(b, k_per_shard, -1)
        ok = out["lsig_ok"].reshape(b, k_per_shard)
        cfo = out["cfo"].reshape(b, k_per_shard)
        # re-interleave each shard's strided share back to sorted order
        nw = n_sp * k_per_shard
        bits_g = jax.lax.all_gather(bits, "sp")              # [n_sp,B,k,nb]
        ok_g = jax.lax.all_gather(ok, "sp")
        cfo_g = jax.lax.all_gather(cfo, "sp")
        bits_f = jnp.moveaxis(bits_g, 0, 2).reshape(b, nw, -1)
        ok_f = jnp.moveaxis(ok_g, 0, 2).reshape(b, nw)
        cfo_f = jnp.moveaxis(cfo_g, 0, 2).reshape(b, nw)
        ok_f = ok_f & val_all
        return bits_f, tg_all, ok_f, cfo_f

    @partial(jax.jit, in_shardings=(cap_shard,))
    def run(capture):
        bits, trig_t, ok, cfo = local(capture)
        return dict(bits=bits, trig_t=trig_t, ok=ok, cfo=cfo)

    return run


def multichip_step(mesh, mod: Mod, n_sym: int):
    """The full multi-chip step: halo-sharded front-end + dp-sharded decode
    + collective reduction of per-packet outcomes (one XLA program)."""
    step = make_rx_step(mod, n_sym)
    n_sp = mesh.shape["sp"]
    cap_shard = NamedSharding(mesh, P("dp", "sp", None))
    win_shard = NamedSharding(mesh, P(("dp", "sp"), None, None))
    t_shard = NamedSharding(mesh, P(("dp", "sp")))

    @partial(jax.jit, in_shardings=(cap_shard, win_shard, t_shard))
    def run(capture, windows, t0):
        ac = sharded_frontend(mesh, capture)
        out = step(windows, t0)
        # global packet counter: the cross-shard reduction that replaces the
        # reference's per-process stdout counters (lib/decode_impl.cc:377)
        n_ok = jnp.sum(out["lsig_ok"].astype(jnp.int32))
        return dict(ac_peak=jnp.max(ac), n_ok=n_ok, bits=out["bits"],
                    cfo=out["cfo"])

    return run
