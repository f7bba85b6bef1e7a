"""Pallas TPU kernel: batched per-row dynamic slice (window gather).

The receiver's hottest non-compute op is the one aligned-window slice
after sync (`rx/receiver` design: slice ONCE, then static windows): for
every packet window, copy x[b, s_b : s_b + L]. XLA lowers the vmapped
`dynamic_slice` to a gather that costs ~4.6 ms at the bench shape
(batch 2048 x 2080 complex samples) — as much as the whole Viterbi.

DMA slices on tiled memrefs must be (8, 128)-aligned in the minor dims,
so an arbitrary-offset copy cannot be a bare DMA. This kernel instead
streams WHOLE rows (the only unconstrained slice axis of a 3-D HBM ref)
into VMEM, 8 per grid step double-buffered, and performs the residual
shift d = s_b - 0 in-register: with d = 128 a + b,

    out[j, l] = row[a + j + (l + b >= 128), (l + b) mod 128]

= a dynamic lane roll by b, two dynamic sublane rolls (a, a+1), and one
lane-position select (`pltpu.roll` takes traced shifts). ~6x faster
than the XLA gather at the bench shape (PERF_NOTES r5).

Parity analog: the reference's per-packet sample copy
(lib/signal_impl.cc:164-192 COPY state) — there a serial memcpy per
packet on the stream thread.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8            # rows per grid step (one [G, nc, 128] DMA each)


def _kernel(b: int, nc: int, ncl: int, g: int):
    def kernel(starts_ref, x_hbm, out_ref, buf, sems):
        i = pl.program_id(0)

        def dma(slot, step):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(step * g, g)],
                buf.at[slot],
                sems.at[slot],
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        n_step = b // g

        @pl.when(i + 1 < n_step)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (ncl, 128), 1)
        for j in range(g):                      # static unroll over rows
            s2 = starts_ref[i * g + j]
            a = s2 // 128
            bb = s2 % 128
            row = buf[i % 2, j]                 # [nc, 128]
            # rolls with positive modular shifts (roll right by n-k ==
            # roll left by k); shifts are traced scalars
            r1 = pltpu.roll(row, (128 - bb) % 128, axis=1)
            r2 = pltpu.roll(r1, (nc - a) % nc, axis=0)[:ncl]
            r3 = pltpu.roll(r1, (nc - a - 1) % nc, axis=0)[:ncl]
            out_ref[j] = jnp.where(lane < 128 - bb, r2, r3)

    return kernel


@lru_cache(maxsize=None)
def _build_call(b: int, nc: int, ncl: int, g: int, interpret: bool):
    return pl.pallas_call(
        _kernel(b, nc, ncl, g),
        interpret=interpret,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((g, ncl, 128), lambda i, starts: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, g, nc, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, ncl, 128), jnp.float32),
    )


def batch_slice_iq_pallas(x2: jnp.ndarray, start: jnp.ndarray, length: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Per-row window slice on float32 I/Q via DMA + in-register shift:
    [B, N, 2] -> [B, L, 2]. Drop-in for ops.sync.batch_slice_iq on TPU
    (starts clip to [0, N - L]; rows pad to the DMA group size)."""
    b, n, _ = x2.shape
    s2 = 2 * jnp.clip(start.astype(jnp.int32), 0, n - length)
    l2 = 2 * length
    nc = -(--(-2 * n // 128) // 8) * 8    # sublane rotate needs nc % 8 == 0
    ncl = min(-(--(-l2 // 128) // 8) * 8, nc)     # out block tile-aligned
    b_pad = -(-b // G) * G
    xf = x2.reshape(b, 2 * n)
    if nc * 128 != 2 * n or b_pad != b:
        xf = jnp.pad(xf, ((0, b_pad - b), (0, nc * 128 - 2 * n)))
        s2 = jnp.pad(s2, (0, b_pad - b))
    call = _build_call(b_pad, nc, ncl, G, interpret)
    out = call(s2, xf.reshape(b_pad, nc, 128))
    return out.reshape(b_pad, ncl * 128)[:b, :l2].reshape(b, length, 2)
