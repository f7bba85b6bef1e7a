"""Table-driven GENERIC data decoder: one program, every (fmt, mcs).

The auto-detecting receivers route each packet to a per-(fmt, mcs)
compiled decoder. That is the right shape for the host-driven streaming
path (each group runs exactly the work its packets need), but inside the
ONE-PROGRAM sharded loop (parallel/sharded.sharded_capture_decode_auto*)
every configured branch costs a separate Viterbi launch and its
sequential-trellis latency — measured ~7 ms per branch regardless of
batch (docs/PERF_NOTES.md), so a 42-config MCS matrix costs ~0.3 s per
invocation even when no packet matches most branches.

This module collapses the branches into DATA: one decoder whose
per-window behavior is driven by a config index. Everything that varied
per branch becomes a table gather:

  * channel estimate: both the legacy and non-legacy estimates are
    computed (two small FFT batches) and selected per window by format;
  * data-symbol position: one per-window dynamic slice at the format's
    data offset (the only data-dependent slice);
  * constellation: the piecewise-linear demapper runs for every
    constellation into a 21-plane "LLR bank" per tone (1+2+4+6+8 bit
    planes); a precomputed index table picks each config's planes;
  * deinterleave + depuncture + stream layout: folded into ONE gather
    per window — `src[cfg, t, j]` maps trellis slot (t, j) straight into
    the flat LLR bank (punctured slots hit a constant zero slot);
  * coding rate / trellis length: every window runs one shared Viterbi
    of n_bits_max steps (pre-depunctured entry, coding.viterbi_decode_
    pairs); configs shorter than the max see zero LLRs past their true
    stream, which is path-neutral.

Cost: one launch of the WORST-case config's trellis for the whole batch,
instead of one launch per branch — the 42-branch dispatch floor becomes
a single ~1.3x-worst-case program (measured in perf_generic_r5.py).

Envelope: 20 MHz SISO data configs (L0-7 / HT0-7 / VHT0-8) — the sharded
loop's planner envelope (parallel/sharded._auto_plan). Reference analog:
the per-packet format dispatch of lib/demod_impl.cc:106-219.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import coding, demod, sync
from ..specs import BW, F, M, Mod, tables
from ..specs import interleaver as ilv

# demap bank: plane offsets of each constellation's bit planes (1+2+4+6+8)
_BANK_MODS = (M.BPSK, M.QPSK, M.QAM16, M.QAM64, M.QAM256)
_NB = {M.BPSK: 1, M.QPSK: 2, M.QAM16: 4, M.QAM64: 6, M.QAM256: 8}
_MOFF = {M.BPSK: 0, M.QPSK: 1, M.QAM16: 3, M.QAM64: 7, M.QAM256: 13}
_NPLANE = 21
_DATA_OFF = {F.L: 208, F.HT: 528, F.VHT: 608}   # vs ltf_start, nLTF=1


def _depuncture_map(cr, n_bits: int) -> np.ndarray:
    """[n_bits, 2] source index into the punctured coded stream, -1 for
    punctured slots (numpy mirror of ops/coding.depuncture)."""
    pat = tables.PUNCTURE[cr].astype(bool)
    tiled = np.tile(pat, -(-2 * n_bits // len(pat)))[:2 * n_bits]
    src = np.full(2 * n_bits, -1, np.int64)
    src[tiled] = np.arange(int(tiled.sum()))
    return src.reshape(n_bits, 2)


@lru_cache(maxsize=None)
def _cfg_tables(configs: Tuple[Tuple[F, int], ...], n_sym: int):
    """Per-config gather tables into the flat per-window LLR bank.

    Bank layout: [n_sym, 52 NL data tones, 21 planes] flattened, plus one
    trailing ZERO slot (index bank_n) that punctured / out-of-stream
    trellis slots read. Returns (src [n_cfg, n_bits_max, 2] int32,
    fmt_code [n_cfg], n_bits [n_cfg], bank_n)."""
    nl_grid = list(np.asarray(tables.DATA_GRID[(BW.BW20, False)]))
    l_grid = np.asarray(tables.DATA_GRID[(BW.BW20, True)])
    l_to_nl = np.asarray([nl_grid.index(b) for b in l_grid])
    bank_n = n_sym * 52 * _NPLANE
    mods = [Mod(f, m) for f, m in configs]
    n_bits_max = n_sym * max(mo.nDBPS for mo in mods)
    src = np.full((len(configs), n_bits_max, 2), bank_n, np.int32)
    for c, mo in enumerate(mods):
        nb = _NB[mo.mod]
        perm = np.asarray(ilv.rx_perm(mo))             # [nCBPS]
        tone = perm // nb
        bit = perm % nb
        if mo.fmt == F.L:
            tone = l_to_nl[tone]
        sym_idx = tone * _NPLANE + _MOFF[mo.mod] + bit  # [nCBPS]
        n_bits_c = n_sym * mo.nDBPS
        dep = _depuncture_map(mo.cr, n_bits_c)          # [n_bits_c, 2]
        coded = dep.reshape(-1)                         # flat coded idx/-1
        s_of = np.where(coded >= 0, coded // mo.nCBPS, 0)
        r_of = np.where(coded >= 0, coded % mo.nCBPS, 0)
        flat = s_of * (52 * _NPLANE) + sym_idx[r_of]
        flat = np.where(coded >= 0, flat, bank_n)
        src[c, :n_bits_c] = flat.reshape(n_bits_c, 2)
    fmt_code = np.asarray([{F.L: 0, F.HT: 1, F.VHT: 2}[f]
                           for f, _ in configs], np.int32)
    n_bits = np.asarray([n_sym * mo.nDBPS for mo in mods], np.int32)
    return src, fmt_code, n_bits, bank_n


@lru_cache(maxsize=None)
def _pilot_ref_table(n_sym: int) -> np.ndarray:
    """[3 formats, n_sym, nP] expected pilot values (L/HT/VHT pidx0)."""
    refs = [np.asarray(demod.pilot_refs(Mod(f, 0), n_sym,
                                        {F.L: 1, F.HT: 3, F.VHT: 4}[f]))
            for f in (F.L, F.HT, F.VHT)]
    return np.stack(refs).astype(np.complex64)


class GenericSisoDecoder:
    """Every-config 20 MHz SISO DATA decoder (one compiled program).

    configs: static tuple of (F, mcs); n_sym: static symbol capacity.
    decode(z, cfg_idx, n_valid): z [G, zlen] complex windows aligned at
    ltf_start - 16 and already CFO-corrected; cfg_idx [G] int32 rows into
    `configs` (invalid windows: pass 0 and mask outside); n_valid [G]
    true symbol counts. Returns descrambled bits [G, n_bits_max].
    """

    def __init__(self, configs: Sequence[Tuple[F, int]], n_sym: int):
        self.configs = tuple(configs)
        self.n_sym = n_sym
        src, fmtc, nbits, bank_n = _cfg_tables(self.configs, n_sym)
        self.n_bits_max = src.shape[1]
        self._src = src
        self._fmt_code = fmtc
        self.n_bits = nbits
        self._bank_n = bank_n

    def zlen(self) -> int:
        return 32 + _DATA_OFF[F.VHT] + 80 * self.n_sym

    def window_capacity(self) -> int:
        return 272 + self.zlen() + 80

    def _decode_z(self, z: jnp.ndarray, cfg_idx: jnp.ndarray,
                  n_valid: jnp.ndarray):
        g_n = z.shape[0]
        nfft, gi, sh = 64, 16, 4
        fmt = jnp.asarray(self._fmt_code)[cfg_idx]          # [G]

        # both channel estimates; select by format
        ltf_l = demod.static_symbol_windows(z, 0, 2, nfft=nfft, gi=gi,
                                            shift=sh, stride=nfft)
        lchan = demod.legacy_chan_est(demod.fft_syms(ltf_l), BW.BW20)
        ltf_n = demod.static_symbol_windows(z, gi + 448, 1, nfft=nfft,
                                            gi=gi, shift=sh)
        nchan = demod.nonlegacy_chan_est_siso(
            demod.fft_syms(ltf_n)[:, 0], BW.BW20)
        chan = jnp.where((fmt == 0)[:, None], lchan, nchan)  # [G, 64]

        # data symbols at the per-format offset (ONE dynamic slice)
        off = jnp.asarray([_DATA_OFF[F.L], _DATA_OFF[F.HT],
                           _DATA_OFF[F.VHT]], jnp.int32)[fmt]
        # slice EXACTLY gi + 80*S samples: any longer and the VHT-offset
        # slice would overrun zlen, making dynamic_slice clamp the start
        # and silently shift every window
        zd = sync._batch_slice(z, gi + off, 80 * self.n_sym + gi)
        gd = demod.fft_syms(demod.static_symbol_windows(
            zd, 0, self.n_sym, nfft=nfft, gi=gi, shift=sh))  # [G, S, 64]
        eq = gd / chan[:, None, :]

        # pilot common-phase (L/HT/VHT polarity offsets differ)
        pil = jnp.asarray(tables.PILOT_GRID[(BW.BW20, False)])
        pref = jnp.asarray(_pilot_ref_table(self.n_sym))[fmt]  # [G, S, nP]
        acc = jnp.sum(eq[..., pil] * jnp.conj(pref), axis=-1)  # [G, S]
        mag = jnp.abs(acc)
        eq = eq / (acc / jnp.where(mag > 0, mag, 1.0))[..., None]

        # CSI weight over the format's own data-tone set
        w_all = jnp.abs(chan) ** 2                           # [G, 64]
        nl_bins = jnp.asarray(tables.DATA_GRID[(BW.BW20, False)])
        l_bins = jnp.asarray(tables.DATA_GRID[(BW.BW20, True)])
        mean_nl = jnp.mean(w_all[:, nl_bins], axis=-1)
        mean_l = jnp.mean(w_all[:, l_bins], axis=-1)
        wmean = jnp.where(fmt == 0, mean_l, mean_nl)
        w = w_all[:, nl_bins] / jnp.maximum(wmean, 1e-12)[:, None]

        # LLR bank: every constellation's planes per NL tone
        tones = eq[..., nl_bins]                             # [G, S, 52]
        planes = []
        for m in _BANK_MODS:
            llr_m = demod.demap_llr(tones, m)                # [G,S,52*nb]
            planes.append(llr_m.reshape(g_n, self.n_sym, 52, _NB[m]))
        bank = jnp.concatenate(planes, axis=-1)              # [G,S,52,21]
        bank = bank * w[:, None, :, None]
        sym_ok = (jnp.arange(self.n_sym, dtype=jnp.int32)[None, :]
                  < n_valid[:, None])
        bank = jnp.where(sym_ok[:, :, None, None], bank, 0.0)
        bank = bank.reshape(g_n, -1)
        bank = jnp.concatenate(
            [bank, jnp.zeros((g_n, 1), bank.dtype)], axis=1)

        # deinterleave + depuncture + rate select: ONE gather per window
        src = jnp.asarray(self._src)[cfg_idx]        # [G, n_bits_max, 2]
        lp = jnp.take_along_axis(bank[:, :, None],
                                 src.reshape(g_n, -1, 1),
                                 axis=1).reshape(g_n, self.n_bits_max, 2)
        bits = coding.viterbi_decode_pairs(lp, self.n_bits_max)
        return coding.descramble(bits)

    def decode(self, x2: jnp.ndarray, ltf_start: jnp.ndarray,
               cfo: jnp.ndarray, cfg_idx: jnp.ndarray,
               n_valid: jnp.ndarray):
        """x2: [G, N, 2] raw float32 windows (like SisoDataDecoder)."""
        from ..utils.riq import r2c
        zl = self.zlen()
        z2 = sync.batch_slice_iq(x2, ltf_start - 16, zl)
        z = r2c(z2) * sync.cfo_ramp(cfo, zl)
        return self._decode_z(z, cfg_idx, n_valid)
