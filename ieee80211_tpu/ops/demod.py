"""Batched OFDM demodulation ops: FFT, equalize, pilot tracking, LLR demap.

TPU-native re-design of the reference per-symbol demod loop
(/root/reference/lib/demod_impl.cc:279-314 and tools/pktRxExample.py:225-434):
all symbols of all packets are processed as one [batch, nSym, nFFT] tensor —
FFT, ZF equalization, pilot common-phase tracking and piecewise-linear LLR
extraction are fused elementwise ops over that tensor, with the per-symbol
pilot polarity precomputed (closed form) instead of carried as state.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..specs import BW, F, M, Mod, tables
from ..specs import interleaver as ilv

# ---------------------------------------------------------------------------
# FFT helpers (shifted-grid convention, matching specs/tables.py)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _dft_mats(n: int):
    """Shifted-output DFT as real matrices (W_re, W_im), each [n, n].

    X_shifted = x @ W^T with W[k', t] = exp(-2j*pi*(k'-n/2)*t/n): the
    64-point FFT becomes two MXU matmuls instead of a generic FFT — on TPU
    the systolic array beats the FFT butterflies at these sizes.
    """
    k = np.arange(n) - n // 2
    t = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, t) / n)
    return (np.ascontiguousarray(np.real(w).T.astype(np.float32)),
            np.ascontiguousarray(np.imag(w).T.astype(np.float32)))


def fft_syms(x: jnp.ndarray) -> jnp.ndarray:
    """Time symbols [..., N] -> shifted-order frequency grid [..., N].

    Implemented as a DFT matmul (MXU) for the PHY's small FFT sizes.
    """
    n = x.shape[-1]
    wr, wi = _dft_mats(n)
    xr = jnp.real(x)
    xi = jnp.imag(x)
    out_r = (jnp.matmul(xr, wr, preferred_element_type=jnp.float32)
             - jnp.matmul(xi, wi, preferred_element_type=jnp.float32))
    out_i = (jnp.matmul(xr, wi, preferred_element_type=jnp.float32)
             + jnp.matmul(xi, wr, preferred_element_type=jnp.float32))
    return jax.lax.complex(out_r, out_i)


def extract_symbol_windows(x: jnp.ndarray, start: jnp.ndarray, n_sym: int,
                           nfft: int = 64, gi: int = 16,
                           shift: int = 8,
                           stride: Optional[int] = None) -> jnp.ndarray:
    """Slice per-packet OFDM symbol windows.

    x: [B, N] packet-aligned samples; start: [B] index of the first symbol's
    GI. Takes each symbol's data window shifted `shift` samples into the GI
    (reference C8P_SYM_SAMP_SHIFT, lib/cloud80211phy.h:33) which is immune
    to small late-timing errors; the induced linear phase cancels against a
    channel estimate taken with the same shift.

    stride: symbol-to-symbol spacing; defaults to gi+nfft. The legacy LTF's
    two repetitions share one double-GI, so they are extracted with
    stride=nfft.
    Returns [B, n_sym, nfft].
    """
    sym = stride if stride is not None else (nfft + gi)
    # one contiguous dynamic slice per packet, then a *static* window take:
    # far cheaper than per-symbol dynamic gathers.
    total = gi - shift + sym * (n_sym - 1) + nfft
    first = start + (0 if gi - shift >= 0 else gi - shift)
    base = max(gi - shift, 0)
    win_idx = (base + sym * np.arange(n_sym)[:, None]
               + np.arange(nfft)[None, :]).astype(np.int32)

    def take(xb, s):
        seg = jax.lax.dynamic_slice(xb, (s,), (total,))
        return seg[jnp.asarray(win_idx)]

    return jax.vmap(take)(x, first)


def static_symbol_windows(z: jnp.ndarray, off: int, n_sym: int,
                          nfft: int = 64, gi: int = 16, shift: int = 8,
                          stride: Optional[int] = None) -> jnp.ndarray:
    """extract_symbol_windows for an already packet-aligned window.

    z: [B, Z] samples whose index 0 is a *fixed* per-packet anchor (e.g.
    ltf_start-16 after one aligned gather); off: static offset of the first
    symbol's GI within z. Pure static slicing/reshape — no gathers.
    """
    sym = stride if stride is not None else (nfft + gi)
    b = z.shape[0]
    s0 = off + gi - shift
    seg = jax.lax.slice_in_dim(z, s0, s0 + sym * n_sym, axis=-1)
    return seg.reshape(b, n_sym, sym)[..., :nfft]


# ---------------------------------------------------------------------------
# pilot tracking
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def pilot_refs(mod: Mod, n_sym: int, pidx0: int, iss: int = 0) -> np.ndarray:
    """Expected pilot values per symbol [n_sym, nSP] (polarity + rotation)."""
    from ..tx.golden import pilot_sequence
    return pilot_sequence(mod, n_sym, iss, pidx0=pidx0)


def pilot_phase(sym_grid: jnp.ndarray, pilot_ref: jnp.ndarray,
                pilot_bins: np.ndarray) -> jnp.ndarray:
    """Common-phase unit phasor per symbol from pilot tones.

    sym_grid: [B, S, nfft] equalized grids; pilot_ref: [S, nP];
    returns [B, S] unit phasors (divide symbols by it to de-rotate).
    """
    pil = sym_grid[..., jnp.asarray(pilot_bins)]          # [B, S, nP]
    acc = jnp.sum(pil * jnp.conj(pilot_ref)[None], axis=-1)
    mag = jnp.abs(acc)
    return acc / jnp.where(mag > 0, mag, 1.0)


# ---------------------------------------------------------------------------
# LLR demap (piecewise-linear folds, parity with procSymQamToLlr:
# lib/cloud80211phy.cc:2090-2148)
# ---------------------------------------------------------------------------


def demap_llr(eq: jnp.ndarray, mod: M) -> jnp.ndarray:
    """Equalized data tones [..., nSD] -> soft bits [..., nSD*nBPSCS]."""
    if mod == M.BPSK:
        return jnp.real(eq)
    if mod == M.QBPSK:
        return jnp.imag(eq)
    nb_axis = {M.QPSK: 1, M.QAM16: 2, M.QAM64: 3, M.QAM256: 4,
               M.QAM1024: 5}[mod]
    kmod = {M.QPSK: np.sqrt(2.0), M.QAM16: np.sqrt(10.0),
            M.QAM64: np.sqrt(42.0), M.QAM256: np.sqrt(170.0),
            M.QAM1024: np.sqrt(682.0)}[mod]
    v = eq * kmod
    levels = []
    for axis in (jnp.real(v), jnp.imag(v)):
        l = axis
        levels.append([l])
        for k in range(1, nb_axis):
            l = (1 << (nb_axis - k)) - jnp.abs(l)
            levels[-1].append(l)
    # bit order: I-axis bits then Q-axis bits per subcarrier
    stacked = jnp.stack(levels[0] + levels[1], axis=-1)   # [..., nSD, 2*nb]
    return stacked.reshape(eq.shape[:-1] + (-1,))


def evm_snr_db(eq: jnp.ndarray, mod: M, axes=(-2, -1),
               sym_mask: jnp.ndarray = None) -> jnp.ndarray:
    """EVM-based SNR from equalized data tones (per-stream SNR analog of
    the reference's SIG-B re-encode measurement, lib/demod_impl.cc:449-505).

    eq: [..., S, nSD] equalized constellation points. The error vector is
    taken against the per-axis quantized (hard-decision) constellation.
    sym_mask: optional [..., S] 0/1 weights — symbols with weight 0 (e.g.
    bucket-padding junk past the true packet end) are excluded.
    """
    if mod in (M.BPSK, M.QBPSK):
        kmod = 1.0
        levels = 1
    else:
        nb = {M.QPSK: 1, M.QAM16: 2, M.QAM64: 3, M.QAM256: 4,
              M.QAM1024: 5}[mod]
        kmod = float(np.sqrt({M.QPSK: 2, M.QAM16: 10, M.QAM64: 42,
                              M.QAM256: 170, M.QAM1024: 682}[mod]))
        levels = 1 << (nb - 1)
    v = eq * kmod
    if mod == M.QBPSK:
        re = jnp.zeros_like(jnp.real(v))
        im = jnp.sign(jnp.imag(v))
    elif mod == M.BPSK:
        re = jnp.sign(jnp.real(v))
        im = jnp.zeros_like(re)
    else:
        def quant(a):
            q = 2 * jnp.round((a - 1) / 2) + 1
            return jnp.clip(q, -(2 * levels - 1), 2 * levels - 1)
        re = quant(jnp.real(v))
        im = quant(jnp.imag(v))
    err = (jnp.real(v) - re) ** 2 + (jnp.imag(v) - im) ** 2
    sig = re ** 2 + im ** 2
    if sym_mask is not None:
        # where (not multiply): junk symbols can be NaN (0/0 phasor) and
        # NaN * 0 = NaN would poison the reduction
        m = jnp.broadcast_to(sym_mask[..., None].astype(bool), err.shape)
        denom = jnp.maximum(jnp.sum(m.astype(err.dtype), axis=axes), 1.0)
        p_err = jnp.sum(jnp.where(m, err, 0.0), axis=axes) / denom
        p_sig = jnp.sum(jnp.where(m, sig, 0.0), axis=axes) / denom
    else:
        p_err = jnp.mean(err, axis=axes)
        p_sig = jnp.mean(sig, axis=axes)
    return 10.0 * jnp.log10(jnp.maximum(p_sig, 1e-12)
                            / jnp.maximum(p_err, 1e-12))


# ---------------------------------------------------------------------------
# channel estimation / equalization (SISO)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def ltf_ref_grid(bw: BW, legacy: bool) -> np.ndarray:
    """LTF reference values on the shifted grid (zeros on null tones)."""
    nfft = tables.NFFT[bw]
    lim = {BW.BW20: 26 if legacy else 28, BW.BW40: 58, BW.BW80: 122}[bw]
    seq = tables.LTF_L[bw] if legacy else (
        tables.LTF_HT[bw] if bw != BW.BW80 else tables.LTF_VHT[bw])
    grid = np.zeros(nfft, dtype=np.complex128)
    grid[nfft // 2 - lim: nfft // 2 + lim + 1] = seq
    return grid


def legacy_chan_est(ltf_syms: jnp.ndarray, bw: BW = BW.BW20) -> jnp.ndarray:
    """[B, 2, nfft] L-LTF freq symbols -> [B, nfft] channel (1.0 on nulls)."""
    ref = jnp.asarray(ltf_ref_grid(bw, True))
    avg = jnp.mean(ltf_syms, axis=1)
    safe_ref = jnp.where(ref == 0, 1.0, ref)
    chan = avg / safe_ref
    return jnp.where(ref == 0, 1.0 + 0j, chan)


def nonlegacy_chan_est_siso(ltf_sym: jnp.ndarray, bw: BW = BW.BW20
                            ) -> jnp.ndarray:
    """[B, nfft] single HT/VHT-LTF freq symbol -> [B, nfft] channel."""
    ref = jnp.asarray(ltf_ref_grid(bw, False))
    safe_ref = jnp.where(ref == 0, 1.0, ref)
    chan = ltf_sym / safe_ref
    return jnp.where(ref == 0, 1.0 + 0j, chan)


def equalize(grids: jnp.ndarray, chan: jnp.ndarray) -> jnp.ndarray:
    """ZF equalize [B, S, nfft] by per-packet channel [B, nfft]."""
    return grids / chan[:, None, :]


# ---------------------------------------------------------------------------
# 2x2 MIMO channel estimation / equalization
# ---------------------------------------------------------------------------


def mimo_chan_est_2x2(ltf_syms: jnp.ndarray, bw: BW = BW.BW20,
                      vht: bool = True) -> jnp.ndarray:
    """2x2 channel from the two HT/VHT-LTF symbols on both RX chains.

    ltf_syms: [B, nRx=2, nLtf=2, nfft] frequency-domain LTF symbols.
    Returns H [B, nfft, nRx, nSTS]. Uses the P-matrix combining
    H[:, :, r, s] = sum_l P[s, l] * Y[r, l] / (ref * nLtf); on VHT pilot
    tones the transmitter sends R (P row 0) on every stream, so the
    per-stream estimate there is replaced by interpolation later.
    (Math parity: lib/demod2_impl.cc:374-409.)
    """
    ref = jnp.asarray(ltf_ref_grid(bw, False))
    safe_ref = jnp.where(ref == 0, 1.0, ref)
    p = jnp.asarray(tables.P_LTF_4[:2, :2])              # [nSTS, nLtf]
    h = jnp.einsum("sl,brlk->bkrs", p, ltf_syms) / 2.0
    h = h / safe_ref[None, :, None, None]
    return jnp.where((ref == 0)[None, :, None, None], 0.0 + 0j, h)


def mimo_equalize_2x2(grids: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """ZF (pseudo-inverse) equalization of 2-stream symbols.

    grids: [B, nRx=2, S, nfft]; h: [B, nfft, nRx, nSTS].
    Returns x_hat [B, nSTS=2, S, nfft] = (H^H H)^-1 H^H y per tone.
    (Math parity: lib/demod2_impl.cc:410-428, 515-518.)
    """
    y = jnp.moveaxis(grids, 1, -1)                        # [B, S, nfft, nRx]
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))                # [B, nfft, nSTS, nRx]
    gram = jnp.einsum("bksr,bkrt->bkst", hh, h)           # [B, nfft, 2, 2]
    a = gram[..., 0, 0]
    b_ = gram[..., 0, 1]
    c = gram[..., 1, 0]
    d = gram[..., 1, 1]
    det = a * d - b_ * c
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12 + 0j)
    inv = jnp.stack([jnp.stack([d, -b_], -1), jnp.stack([-c, a], -1)], -2)
    inv = inv / det[..., None, None]                      # [B, nfft, 2, 2]
    w = jnp.einsum("bkst,bktr->bksr", inv, hh)            # [B, nfft, 2, nRx]
    return jnp.einsum("bksr,bGkr->bsGk", w, y)            # [B,2,S,nfft]


# ---------------------------------------------------------------------------
# 2x2 max-log ML detection
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _ml_candidates(mod: M):
    """(points [Nc] complex64, bit0_masks [nBPSCS, Nc] bool) for one stream.

    Candidate index == chip value, so bit p of the index is coded bit p of
    the subcarrier group — the same layout demap_llr emits.
    """
    pts = np.asarray(tables.QAM_TAB[mod], dtype=np.complex64)
    nb = int(np.log2(len(pts)))
    idx = np.arange(len(pts))
    masks = np.stack([(idx >> p) & 1 for p in range(nb)]).astype(bool)
    return pts, masks


def _slice_to_grid(z: jnp.ndarray, mod: M) -> jnp.ndarray:
    """Exact nearest constellation point per scalar complex z (QAM grids
    quantize per axis; BPSK/QBPSK collapse to one axis)."""
    if mod == M.BPSK:
        return jnp.sign(jnp.real(z)) + 0j
    if mod == M.QBPSK:
        return 1j * jnp.sign(jnp.imag(z))
    nb_axis = {M.QPSK: 1, M.QAM16: 2, M.QAM64: 3, M.QAM256: 4,
               M.QAM1024: 5}[mod]
    kmod = float(tables.KMOD[mod])
    lim = float((1 << nb_axis) - 1)
    v = z * kmod

    def q(a):
        return jnp.clip(2 * jnp.round((a - 1) / 2) + 1, -lim, lim)
    return jax.lax.complex(q(jnp.real(v)), q(jnp.imag(v))) / kmod


def ml_detect_llr_2x2(gd: jnp.ndarray, h: jnp.ndarray, mod: M
                      ) -> jnp.ndarray:
    """Exact max-log ML soft detection for 2 spatial streams.

    gd: [B, nRx=2, S, nSD] phase-corrected tone observations (data bins
    only); h: [B, nSD, nRx, nSTS=2] channel at those bins.
    Returns LLRs [B, nSTS, S, nCBPSS] in demap_llr's per-stream layout.

    Replaces the linear ZF equalizer of the reference 2x2 chain
    (lib/demod2_impl.cc:410-428,515-518) with true max-log ML: for each
    stream j and candidate c_j, the interfering stream's symbol is sliced
    exactly (single-interferer projection onto the QAM grid is the exact
    conditional minimum), giving d2(c_j) = min over the full product
    alphabet. LLR_p = min[d2 | bit_p=0] - min[d2 | bit_p=1]. On
    ill-conditioned channels this wins the ~20·log10(cond) dB the ZF
    noise-enhancement loses — packets the reference drops at dense
    constellations decode cleanly.

    Everything is batched elementwise/matmul arithmetic over a static
    [B, S, nSD, Nc] candidate tensor — no data-dependent control flow, so
    XLA fuses it; Nc <= 256 (two passes of Nc instead of Nc^2).
    """
    pts_np, masks_np = _ml_candidates(mod)
    pts = jnp.asarray(pts_np)                              # [Nc]
    y = jnp.moveaxis(gd, 1, -1)                            # [B, S, nSD, nRx]
    llrs = []
    for j in (0, 1):
        o = 1 - j
        hj = h[..., j]                                     # [B, nSD, nRx]
        ho = h[..., o]
        ho_n2 = jnp.sum(jnp.abs(ho) ** 2, axis=-1)         # [B, nSD]
        ho_n2 = jnp.maximum(ho_n2, 1e-20)
        # residual r = y - hj*cj for all candidates: [B, S, nSD, Nc, nRx]
        r = (y[..., None, :]
             - hj[:, None, :, None, :] * pts[None, None, None, :, None])
        # exact conditional min over the other stream: project + slice
        z = (jnp.sum(jnp.conj(ho)[:, None, :, None, :] * r, axis=-1)
             / ho_n2[:, None, :, None])                    # [B, S, nSD, Nc]
        co = _slice_to_grid(z, mod)
        r2 = r - ho[:, None, :, None, :] * co[..., None]
        d2 = jnp.sum(jnp.abs(r2) ** 2, axis=-1)            # [B, S, nSD, Nc]
        big = jnp.asarray(np.float32(1e30))
        lj = []
        for p in range(masks_np.shape[0]):
            m1 = jnp.asarray(masks_np[p])                  # bit p == 1
            min0 = jnp.min(jnp.where(m1, big, d2), axis=-1)
            min1 = jnp.min(jnp.where(m1, d2, big), axis=-1)
            lj.append(min0 - min1)
        # [B, S, nSD, nb] -> [B, S, nSD*nb] (I bits then Q bits per tone,
        # bit p of the chip == position p: demap_llr layout)
        llrs.append(jnp.stack(lj, axis=-1).reshape(
            d2.shape[0], d2.shape[1], -1))
    return jnp.stack(llrs, axis=1)                         # [B, 2, S, nCBPSS]


# ---------------------------------------------------------------------------
# full data-field demod (per static config)
# ---------------------------------------------------------------------------


def _demod_data_tail(eq: jnp.ndarray, mod: Mod, n_sym: int, pidx0: int,
                     with_snr: bool, n_valid_sym: jnp.ndarray,
                     weight_grid: jnp.ndarray = None):
    """Shared post-equalization tail: pilot phase track + demap +
    deinterleave + bucket-padding mask (+ EVM SNR).

    eq: [B, n_sym, nfft] equalized symbol grids.

    weight_grid: optional [B, nfft] REAL per-tone noise-inverse weight
    (|H|^2 for ZF SISO, sum_r |H_r|^2 for MRC). ZF equalization inflates
    the noise on faded tones by 1/|H|^2; unweighted LLRs hand those tones
    the same vote as clean ones and multipath packets die ~6 dB early
    (the round-3 VHT7 fading `None` waterfalls). Scaling each tone's LLRs
    by its weight restores the max-log metric under colored noise — on a
    flat channel the weight is uniform and decisions are unchanged. (The
    reference RX never weights — lib/cloud80211phy.cc procSymQamToLlr —
    this is a beyond-reference gain.)"""
    legacy = mod.fmt == F.L
    key = (mod.bw, legacy)
    pref = jnp.asarray(pilot_refs(mod, n_sym, pidx0))
    ph = pilot_phase(eq, pref, tables.PILOT_GRID[key])
    eq = eq / ph[..., None]
    data = eq[..., jnp.asarray(tables.DATA_GRID[key])]    # [B, S, nSD]
    llr = demap_llr(data, mod.mod)                        # [B, S, nCBPSS]
    if weight_grid is not None:
        w = weight_grid[..., jnp.asarray(tables.DATA_GRID[key])]
        w = w / jnp.maximum(jnp.mean(w, axis=-1, keepdims=True), 1e-12)
        nb = llr.shape[-1] // data.shape[-1]
        llr = llr * jnp.repeat(w, nb, axis=-1)[:, None, :]
    perm = jnp.asarray(ilv.rx_perm(mod, 0))
    out = llr[..., perm].reshape(llr.shape[0], -1)
    if n_valid_sym is None:
        if with_snr:
            return out, evm_snr_db(data, mod.mod)
        return out
    sym_of = jnp.arange(n_sym, dtype=jnp.int32)
    m = sym_of[None, :] < n_valid_sym[:, None]            # [B, S]
    ncbpss = out.shape[1] // n_sym
    out = jnp.where(jnp.repeat(m, ncbpss, axis=1), out, 0.0)
    if with_snr:
        return out, evm_snr_db(data, mod.mod, sym_mask=m)
    return out


def demod_data_siso(sym_grids: jnp.ndarray, chan: jnp.ndarray, mod: Mod,
                    n_sym: int, pidx0: int, with_snr: bool = False,
                    n_valid_sym: jnp.ndarray = None,
                    csi_weight: bool = True):
    """Equalize+track+demap+deinterleave the DATA field.

    sym_grids: [B, n_sym, nfft] raw FFT grids; chan: [B, nfft].
    Returns LLRs in coded-bit order [B, n_sym * nCBPSS]; with with_snr also
    the per-packet EVM SNR [B] in dB.

    n_valid_sym: optional traced [B] int32 — the true per-packet symbol
    count when n_sym is a static BUCKET (compile-count bounding): LLRs of
    symbols >= n_valid_sym are forced to 0 (path-neutral in the Viterbi)
    and excluded from the EVM, so one compiled program serves every packet
    length within the bucket.

    csi_weight: scale each tone's LLRs by |H|^2 (max-ratio weighting; see
    _demod_data_tail) — identical decisions on flat channels, ~6 dB of
    multipath robustness back on frequency-selective ones.
    """
    eq = equalize(sym_grids, chan)
    wg = jnp.abs(chan) ** 2 if csi_weight else None
    return _demod_data_tail(eq, mod, n_sym, pidx0, with_snr, n_valid_sym,
                            weight_grid=wg)


def mrc_combine(grids: jnp.ndarray, chan: jnp.ndarray) -> jnp.ndarray:
    """Maximal-ratio combining of multi-chain symbol grids.

    grids: [B, nRx, S, nfft] per-chain FFT grids; chan: [B, nRx, nfft]
    per-chain channel. Returns the combined equalized grid [B, S, nfft]
    eq = sum_r conj(H_r) Y_r / sum_r |H_r|^2 — the matched-filter
    (max-SNR) combiner for a single transmitted stream.
    """
    wt = jnp.conj(chan)
    den = jnp.sum(jnp.abs(chan) ** 2, axis=1) + 1e-9      # [B, nfft]
    return jnp.einsum("brsk,brk->bsk", grids, wt) / den[:, None, :]


def demod_data_mrc(sym_grids: jnp.ndarray, chan: jnp.ndarray, mod: Mod,
                   n_sym: int, pidx0: int, with_snr: bool = False,
                   n_valid_sym: jnp.ndarray = None,
                   csi_weight: bool = True):
    """demod_data_siso for a single-stream packet on MULTIPLE RX chains.

    sym_grids: [B, nRx, n_sym, nfft]; chan: [B, nRx, nfft]. MRC-combines
    the chains (2-chain diversity the reference's dual-antenna RX never
    had for legacy/SISO packets — it decodes them from chain 0 only,
    lib/demod2_impl.cc:213-276), then runs the shared demod tail. The
    MRC combiner's post-combining noise variance is 1/sum_r |H_r|^2 per
    tone — that sum is the CSI weight.
    """
    eq = mrc_combine(sym_grids, chan)
    wg = jnp.sum(jnp.abs(chan) ** 2, axis=1) if csi_weight else None
    return _demod_data_tail(eq, mod, n_sym, pidx0, with_snr, n_valid_sym,
                            weight_grid=wg)
