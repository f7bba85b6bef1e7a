"""Fixed-config end-to-end RX pipeline: one jit program from raw samples to
descrambled bits.

This is the flagship compute graph of the framework (the analog of the
reference's whole rx.grc flowgraph, SURVEY.md §3.1, collapsed into a single
XLA program): trigger-relative windows in, MPDU bits out. Everything —
sync, CFO, channel estimation, L-SIG validation, per-symbol demod and the
64-state Viterbi — runs batched on-device with static shapes.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import coding, demod, sync
from ..specs import BW, CR, F, Mod, tables
from ..specs import interleaver as ilv
from ..specs.modulation import PpduParams

OFF_LSIG = 128
OFF_NLLTF = 448


def make_rx_step(mod: Mod, n_sym: int, csi_weight: bool = True):
    """Build the full RX step for a static (Mod, n_sym) config (any bw).

    Returns fn(x2: [B, W, 2] float32 I/Q, t0: [B] int32) -> dict with:
      bits [B, n_bits] descrambled data bits, ltf_start, cfo, snr, lsig_ok.
    (Real-valued boundary per utils/riq.py convention.)

    csi_weight: per-tone |H|^2 LLR weighting (ops/demod._demod_data_tail)
    — identical on flat channels, large gain on multipath; False gives
    the reference's unweighted demap for A/B rows.
    """
    from ..utils.riq import r2c
    n_bits = n_sym * mod.nDBPS
    q = tables.NFFT[mod.bw] // 64
    # data-symbol window shift: 4q (not the reference's 8q,
    # C8P_SYM_SAMP_SHIFT). The shift absorbs LATE timing; multipath
    # needs the window LATE (cyclic validity: window start >= CIR
    # delay). Sync's timing lands within ~2 samples of the first
    # tap, so 8q of late margin was unused while delay-spread
    # tolerance capped at ~6q; 4q re-centers the margin: r5 probe
    # showed noiseless VHT9 fading failures (EVM floor ~25 dB for
    # reflections at 12..16 samples @40 MHz) vanish with the window
    # 4q later, while clean-channel decodes are bit-identical.
    nfft, gi, sh = 64 * q, 16 * q, 4 * q

    def data_offset() -> int:
        if mod.fmt == F.L:
            off = OFF_LSIG + 80
        elif mod.fmt == F.HT:
            off = OFF_NLLTF + 80 * mod.nLTF
        else:
            off = OFF_NLLTF + 80 * mod.nLTF + 80
        return off * q

    # legacy-band duplicated SIG indexing (wide bw): copies combined
    d20 = np.asarray(tables.DATA_GRID[(BW.BW20, True)])
    p20 = np.asarray(tables.PILOT_GRID[(BW.BW20, True)])
    data_idx = np.concatenate([d20 + 64 * c for c in range(q)])
    pilot_idx = np.concatenate([p20 + 64 * c for c in range(q)])
    pil_l = np.tile(tables.PILOT_L, q)

    def step(x2: jnp.ndarray, t0: jnp.ndarray):
        ltf_start, cfo, snr = sync.sync_front_iq(x2, t0, q=q)

        # ONE aligned window slice (on flat f32 I/Q — see batch_slice_iq):
        # everything downstream is static slicing of z (anchor =
        # ltf_start-16q). The CFO ramp uses z-local indices; the constant
        # phase offset vs absolute time is common to the LTF channel
        # estimate and every data symbol, so it cancels in equalization.
        zlen = 32 * q + data_offset() + 80 * q * n_sym
        z = r2c(sync.batch_slice_iq(x2, ltf_start - gi, zlen))
        z = z * sync.cfo_ramp(cfo, zlen)

        ltf_t = demod.static_symbol_windows(z, 0, 2, nfft=nfft, gi=gi,
                                            shift=sh, stride=nfft)
        lchan = demod.legacy_chan_est(demod.fft_syms(ltf_t), mod.bw)

        # L-SIG validation (cheap; always decoded as in the reference RX)
        g = demod.fft_syms(demod.static_symbol_windows(
            z, gi + OFF_LSIG * q, 1, nfft=nfft, gi=gi, shift=sh))
        eq = demod.equalize(g, lchan)
        pref = jnp.asarray(pil_l[None] * tables.PILOT_POLARITY[0:1, None])
        ph = demod.pilot_phase(eq, pref, pilot_idx)
        eq = (eq / ph[..., None])[:, 0]
        tones = eq[:, jnp.asarray(data_idx)]
        tones = tones.reshape(tones.shape[0], q, 48).sum(axis=1)
        lsig_llr = jnp.real(tones)[:, jnp.asarray(ilv.sig_rx_perm())]
        lsig_bits = coding.viterbi_decode(lsig_llr, CR.CR12, 24)
        lsig_ok = ((jnp.sum(lsig_bits[:, :17], axis=-1) % 2)
                   == lsig_bits[:, 17])

        # DATA field
        if mod.fmt == F.L:
            chan = lchan
            pidx0 = 1
        else:
            nl = demod.static_symbol_windows(z, gi + OFF_NLLTF * q, 1,
                                             nfft=nfft, gi=gi, shift=sh)
            chan = demod.nonlegacy_chan_est_siso(demod.fft_syms(nl)[:, 0],
                                                 mod.bw)
            pidx0 = 3 if mod.fmt == F.HT else 4
        gd = demod.fft_syms(demod.static_symbol_windows(
            z, gi + data_offset(), n_sym, nfft=nfft, gi=gi, shift=sh))
        llrs = demod.demod_data_siso(gd, chan, mod, n_sym, pidx0,
                                     csi_weight=csi_weight)
        bits = coding.viterbi_decode(llrs, mod.cr, n_bits)
        scr = coding.descramble(bits)
        return dict(bits=scr, ltf_start=ltf_start, cfo=cfo, snr=snr,
                    lsig_ok=lsig_ok)

    return step


class RxPipeline:
    """Jitted fixed-config receiver with helpers for benchmarking."""

    def __init__(self, mod: Mod, n_sym: int, psdu_len: int,
                 csi_weight: bool = True):
        self.mod = mod
        self.n_sym = n_sym
        self.psdu_len = psdu_len
        self.step = jax.jit(make_rx_step(mod, n_sym, csi_weight=csi_weight))

    def window_len(self) -> int:
        base = 192 + 128 + 80  # sync slack + LTF + L-SIG
        if self.mod.fmt == F.L:
            extra = 0
        elif self.mod.fmt == F.HT:
            extra = 160 + 80 + 80 * self.mod.nLTF
        else:
            extra = 160 + 80 + 80 * self.mod.nLTF + 80
        q = tables.NFFT[self.mod.bw] // 64
        return (base + extra + 80 * self.n_sym + 80) * q

    def __call__(self, x, t0):
        return self.step(x, t0)
