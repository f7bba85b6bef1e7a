"""Pallas TPU kernel: 64-state soft Viterbi (ACS + in-VMEM traceback).

The dominant RX cost (SURVEY.md §3.1, lib/decode_impl.cc:205-281) as a
single fused kernel:

  * layout: batch on the 128-lane axis, trellis states on sublanes — every
    vector op runs 128 packets wide;
  * radix-2^k ACS: k trellis steps fused per iteration, branch metrics via
    one [512, 2k] x [2k, 128] matmul;
  * survivor decisions never touch HBM: they stay in a VMEM scratch and the
    traceback runs inside the same kernel, so the only HBM traffic is the
    LLR stream in (double-buffered DMA) and decoded bits out;
  * per-iteration metric renorm keeps f32 bounded on 33k-step trellises.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...specs import CR, tables
from ..coding import depuncture

TB = 2048        # default batch tile (multiple of the 128-lane width);
                 # wider tiles amortize the per-iteration overhead of the
                 # sequential ACS loop. Round-3 TPU sweep at batch 2048:
                 # tb=2048 (one tile, whole batch) 7.40 ms vs 512's
                 # 7.98 ms — earlier rounds' 512-beats-1024 result was
                 # from a VMEM-tighter kernel; the survivor-pack + 80 MB
                 # guard below keeps wide tiles inside VMEM now
RADIX = 4        # supported radix: 3 or 4 (k<=2 shapes lay out badly on
                 # the VPU and are not maintained)
NEG = -1e30


@lru_cache(maxsize=None)
def _w_cat_pmaj(k: int) -> np.ndarray:
    """Path-major branch-metric matrix [2^k * 64, 2k]: row (p * 64 + s).
    With the path axis MAJOR, the ACS max/argmax over paths becomes a
    tree of elementwise vreg ops instead of a cross-sublane reduce."""
    w = _w_cat(k)
    npaths = 1 << k
    out = np.zeros_like(w)
    for s in range(64):
        for p in range(npaths):
            out[p * 64 + s] = w[s * npaths + p]
    return out


@lru_cache(maxsize=None)
def _w_cat(k: int) -> np.ndarray:
    """Branch-metric matrix [64 * 2^k, 2 * k]: row (s * 2^k + p), column
    (j * 2 + c) holds output bit c of step j on path p into state s."""
    from ..coding import _radix_tables
    w0, w1 = _radix_tables(k)          # [64, 2^k, k]
    npaths = 1 << k
    out = np.zeros((64 * npaths, 2 * k), dtype=np.float32)
    for s in range(64):
        for p in range(npaths):
            for j in range(k):
                out[s * npaths + p, j * 2 + 0] = w0[s, p, j]
                out[s * npaths + p, j * 2 + 1] = w1[s, p, j]
    return out


def _kernel(n_blk: int, chunk: int, k: int, TB: int = 128,
            pack: int = 1, renorm: int = 1, dt=jnp.float32,
            llr_dt=None, pmajor: bool = True):
    """pack = trellis blocks per survivor byte (k*pack <= 8): decisions are
    shift-packed into one int8 plane every `pack` steps, cutting survivor
    VMEM by pack x (what allows whole-batch tiles). renorm = metric renorm
    period in blocks (growth per block <= 2k*max|LLR| — renorming every
    step is wasted vector work). dt = STORAGE dtype for the metric plane
    and wmat: bfloat16 halves the metric VMEM. llr_dt (defaults to dt) =
    dtype of the LLR double buffer and its HBM DMA — int8 cuts the LLR
    DMA traffic 4x vs f32 (the caller pre-scales rows to +-126). All
    per-step COMPUTE (branch metrics, add, compare, select, renorm) runs
    in float32 regardless — Mosaic on this target rejects bf16
    arith.cmpf, and f32 compute avoids every such hazard while keeping
    the memory savings.

    pmajor (default): path-major ACS layout — wmat rows are ordered
    (p * 64 + s) so the 2^k-way max/argmax over paths runs as an
    elementwise compare-select tournament across separate vregs instead
    of a cross-sublane reduce (jnp.max/argmax over a sublane axis lowers
    to rotate chains). Measured 24-27% faster end to end at the bench
    shapes; the state-major path is kept selectable for A/Bs."""
    if llr_dt is None:
        llr_dt = dt
    npaths = 1 << k
    n_low = 64 // npaths
    n_ch = n_blk // chunk
    p2k = -(-2 * k // 8) * 8     # flattened (step, bit) axis padded to 8:
                                 # Mosaic slices need the sublane dim
                                 # tile-aligned (radix 3's bare 6 fails)
    assert k * pack <= 8 and chunk % pack == 0

    def kernel(llr_hbm, wmat_ref, bits_ref, dec_ref, m_ref, pk_ref,
               buf, sem):
        i = pl.program_id(0)

        def dma(slot, c):
            return pltpu.make_async_copy(
                llr_hbm.at[pl.ds(c * chunk, chunk), :,
                           pl.ds(i * TB, TB)],
                buf.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()

        # init metrics: state 0 = 0, rest = NEG
        row = jax.lax.broadcasted_iota(jnp.int32, (64, TB), 0)
        m_ref[:] = jnp.where(row == 0, 0.0, NEG).astype(dt)

        wmat = wmat_ref[:]                         # [64*2^k, 2k]

        def fwd_chunk(c, _):
            slot = c % 2

            @pl.when(c + 1 < n_ch)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(slot, c).wait()

            def fwd_step(tt, _):
                t = c * chunk + tt
                # [p2k, TB]: the (step, coded-bit) axes arrive flattened
                # and padded to the sublane tile (zero columns of wmat
                # cancel the pad rows)
                llr2 = buf[slot, tt].astype(jnp.float32)
                bm = jnp.dot(wmat.astype(jnp.float32), llr2,
                             preferred_element_type=jnp.float32)
                m = m_ref[:].astype(jnp.float32)
                if pmajor:
                    # p-major ACS: bm rows are (p*64+s); predecessor
                    # metrics arrive via a static 64-row permutation; the
                    # 2^k-way max+argmax runs as an elementwise tournament
                    # over the MAJOR path axis (no cross-sublane reduce).
                    # perm row (p*n_low+lo) = m[lo*npaths+p]: a
                    # (n_low, npaths) sublane transpose
                    pm = jnp.swapaxes(m.reshape(n_low, npaths, TB),
                                      0, 1).reshape(64, TB)
                    bm4 = bm.reshape(npaths, npaths, n_low, TB)
                    pm3 = pm.reshape(npaths, 1, n_low, TB)

                    # fused add+merge: each path's candidate is computed
                    # on the fly and folded immediately, so the [64*2^k,
                    # TB] candidate tensor (4 MB/stage at full tile —
                    # far beyond vector registers) is never materialized
                    def cand_p(p):
                        return bm4[p] + pm3[p]

                    # two-level merge keeps <=5 [64, TB] planes live:
                    # linear within groups of 4 (ties keep the lower p),
                    # then a tree across the 4 group winners
                    gv, gi = [], []
                    for g0 in range(0, npaths, 4):
                        va = cand_p(g0)
                        ia = None
                        for p in range(g0 + 1, g0 + 4):
                            vb = cand_p(p)
                            upd = vb > va
                            va = jnp.where(upd, vb, va)
                            ia = jnp.where(
                                upd, jnp.int32(p),
                                jnp.int32(g0) if ia is None else ia)
                        gv.append(va)
                        gi.append(ia)
                    while len(gv) > 1:
                        nv, ni = [], []
                        for j in range(0, len(gv), 2):
                            upd = gv[j + 1] > gv[j]
                            nv.append(jnp.where(upd, gv[j + 1], gv[j]))
                            ni.append(jnp.where(upd, gi[j + 1], gi[j]))
                        gv, gi = nv, ni
                    new_m = gv[0].reshape(64, TB)
                    dec = gi[0].reshape(64, TB)
                else:
                    # state s = hi * n_low + lo; predecessor of (s, path)
                    # is lo * npaths + path, so bm rows (s*npaths+p)
                    # reshape to [hi, lo, p] and the metric m reshapes to
                    # [lo, p], broadcast over hi.
                    cand = (bm.reshape(npaths, n_low, npaths, TB)
                            + m.reshape(n_low, npaths, TB)[None, :, :, :])
                    if npaths == 2:
                        c0 = cand[:, :, 0]
                        c1 = cand[:, :, 1]
                        dec = (c1 > c0).astype(jnp.int32).reshape(64, TB)
                        new_m = jnp.maximum(c0, c1).reshape(64, TB)
                    else:
                        dec = jnp.argmax(cand, axis=2).astype(
                            jnp.int32).reshape(64, TB)
                        new_m = jnp.max(cand, axis=2).reshape(64, TB)

                # one unconditional store + a rare renorm region (two
                # complementary pl.whens cost a predicated region EVERY
                # stage; the re-store every renorm-th stage is cheaper)
                m_ref[:] = new_m.astype(dt)

                @pl.when(t % renorm == renorm - 1)
                def _():
                    m_ref[:] = (new_m
                                - jnp.max(new_m, axis=0,
                                          keepdims=True)).astype(dt)

                if pack == 1:
                    dec_ref[t] = dec.astype(jnp.int8)
                else:
                    @pl.when(t % pack == 0)
                    def _():
                        pk_ref[:] = dec

                    @pl.when(t % pack != 0)
                    def _():
                        pk_ref[:] = (pk_ref[:] << k) | dec

                    @pl.when(t % pack == pack - 1)
                    def _():
                        dec_ref[t // pack] = pk_ref[:].astype(jnp.int8)
                return 0

            jax.lax.fori_loop(0, chunk, fwd_step, 0)
            return 0

        jax.lax.fori_loop(0, n_ch, fwd_chunk, 0)

        # traceback: packed k-bit words, stored in aligned 8-row groups
        m_fin = m_ref[:].astype(jnp.float32)
        state = jnp.argmax(m_fin, axis=0).astype(jnp.int32)   # [TB]

        mask_k = (1 << k) - 1

        def back_group(gg, state):
            rows = []
            for j in range(8):                    # static unroll
                t = n_blk - 1 - (gg * 8 + j)
                dec_t = dec_ref[t // pack].astype(jnp.int32)  # [64, TB]
                if pack > 1:
                    sh = k * (pack - 1 - (t % pack))
                    dec_t = (dec_t >> sh) & mask_k
                sel = row == state[None, :]
                d = jnp.sum(jnp.where(sel, dec_t, 0), axis=0)
                packed = (state >> (6 - k)) & mask_k
                rows.append(packed)
                state = ((state & (n_low - 1)) << k) + d
            block = jnp.stack(rows[::-1], axis=0)  # ascending t within group
            g_start = pl.multiple_of(n_blk - 8 - gg * 8, 8)
            bits_ref[pl.ds(g_start, 8), :] = block
            return state

        jax.lax.fori_loop(0, n_blk // 8, back_group, state)

    return kernel


@lru_cache(maxsize=None)
def _build_call(n_blk: int, chunk: int, k: int, n_tiles: int, TB: int = 128,
                pack: int = 1, renorm: int = 1, dt=jnp.float32,
                interpret: bool = False, llr_dt=None, pmajor: bool = True):
    if llr_dt is None:
        llr_dt = dt
    npaths = 1 << k
    p2k = -(-2 * k // 8) * 8
    kern = _kernel(n_blk, chunk, k, TB, pack, renorm, dt, llr_dt,
                   pmajor=pmajor)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # llr in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wmat
        ],
        out_specs=pl.BlockSpec((n_blk, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blk, n_tiles * TB), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_blk // pack, 64, TB), jnp.int8),  # survivors
            pltpu.VMEM((64, TB), dt),                       # metrics
            pltpu.VMEM((64, TB), jnp.int32),                # pack acc
            pltpu.VMEM((2, chunk, p2k, TB), llr_dt),        # llr double buf
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _pick_chunk(n_blk: int, pack: int = 1) -> int:
    for c in (64, 52, 40, 32, 26, 20, 16, 13, 8, 5, 4, 2, 1):
        if n_blk % c == 0 and c % pack == 0:
            return c
    return pack


RENORM = 64      # metric renorm period in radix blocks (r3 sweep)
DTYPE = jnp.float32   # storage dtype for LLR DMA + metric plane (bf16
                      # halves the DMA traffic; compute stays f32). Module
                      # level so an end-to-end A/B can retune like RADIX/TB.
PMAJOR = True    # path-major ACS layout (elementwise tournament over the
                 # major path axis; +24-27% vs the state-major sublane
                 # reduce — r5 A/B, PERF_NOTES). Module-level for A/Bs.


def viterbi_decode_pallas(llrs: jnp.ndarray, cr: CR, n_bits: int,
                          radix: int = None, tb: int = None,
                          pack: int = None,
                          renorm: int = None,
                          dtype=None,
                          pmajor: bool = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in for coding.viterbi_decode on TPU. llrs: [B, n_coded] f32
    punctured soft bits — or, with cr=None, PRE-DEPUNCTURED [B, n_bits, 2]
    (or [B, n_bits*2]) LLR pairs (the table-driven generic decoder folds
    depuncturing into its per-window gather).

    radix/tb/renorm/dtype default to the module-level RADIX/TB/RENORM/
    DTYPE at CALL time (so sweeps and tests can retune without
    re-importing).

    interpret=True runs the kernel through the Pallas interpreter on any
    backend — the CPU-CI numerics gate for every exposed config (the bf16
    default regression of round 1 would have been caught here)."""
    dt = dtype if dtype is not None else DTYPE
    if radix is None:
        radix = RADIX
    if pmajor is None:
        pmajor = PMAJOR
    # int8 LLR DMA; metrics/compute stay f32. Mosaic int8 VMEM slices need
    # the sublane (2k) dim 4-aligned -> even radix only (radix 3 falls
    # back to f32 storage on hardware; the interpreter accepts either).
    int8_llr = dt == jnp.int8 and (radix % 2 == 0 or interpret)
    if dt == jnp.int8 and not int8_llr:
        dt = jnp.float32
    met_dt = jnp.float32 if int8_llr else dt
    if tb is None:
        tb = TB
    if renorm is None:
        renorm = RENORM
    k = radix
    b = llrs.shape[0]
    tb = min(tb, -(-b // 128) * 128)
    n_blk = -(-(-(-n_bits // k)) // 8) * 8        # multiple of 8 groups
    if pack is None:
        # prefer UNPACKED survivors when they fit at the full batch tile:
        # dropping the shift/or accumulator and its predicated regions
        # measured ~4% on the headline shape (r5); pack only when packing
        # is what keeps the tile from shrinking
        pack = 1 if n_blk * 64 * tb <= 80 * 1024 * 1024 else 8 // k
    # survivor scratch is [n_blk/pack, 64, tb] int8 and must fit in VMEM:
    # shrink the batch tile for long trellises (e.g. 80 MHz high-MCS)
    while tb > 128 and n_blk // pack * 64 * tb > 80 * 1024 * 1024:
        tb //= 2
    t_pad = n_blk * k
    if int8_llr:
        # per-row prescale to +-126: Viterbi decisions are scale-invariant
        # per packet, so only the 8-bit rounding (<= -48 dB on the largest
        # LLR) is lost; depunctured zeros stay exactly 0
        s = 126.0 / jnp.maximum(
            jnp.max(jnp.abs(llrs), axis=1, keepdims=True), 1e-20)
        llrs = llrs * s
    lp = llrs if cr is None else depuncture(llrs, cr, n_bits)
    lp = lp.reshape(lp.shape[0], -1, 2)                    # [B, n_bits, 2]
    if t_pad != n_bits:
        lp = jnp.pad(lp, ((0, 0), (0, t_pad - n_bits), (0, 0)))
    b_pad = -(-b // tb) * tb
    if b_pad != b:
        lp = jnp.pad(lp, ((0, b_pad - b), (0, 0), (0, 0)))
    # [B, T, 2] -> [nBlk, p2k, B]: flattened (k, 2) axis padded to the
    # 8-sublane tile (see kernel note); wmat gets matching zero columns
    p2k = -(-2 * k // 8) * 8
    ltr = jnp.moveaxis(lp.reshape(b_pad, n_blk, 2 * k), 0, -1)
    if p2k != 2 * k:
        ltr = jnp.pad(ltr, ((0, 0), (0, p2k - 2 * k), (0, 0)))
    ltr = (jnp.round(ltr).astype(jnp.int8) if int8_llr
           else ltr.astype(dt))
    chunk = _pick_chunk(n_blk, pack)
    call = _build_call(n_blk, chunk, k, b_pad // tb, tb, pack, renorm,
                       met_dt, interpret,
                       llr_dt=jnp.int8 if int8_llr else None,
                       pmajor=pmajor)
    wmat_np = _w_cat_pmaj(k) if pmajor else _w_cat(k)
    if p2k != 2 * k:
        wmat_np = np.pad(wmat_np, ((0, 0), (0, p2k - 2 * k)))
    wmat = jnp.asarray(wmat_np).astype(met_dt)
    packed = call(ltr, wmat)                               # [nBlk, B] int32
    packed = jnp.moveaxis(packed, 0, 1)[:b]                # [B, nBlk]
    bits = (packed[:, :, None] >> jnp.arange(k, dtype=jnp.int32)) & 1
    return bits.reshape(b, t_pad)[:, :n_bits]
