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
