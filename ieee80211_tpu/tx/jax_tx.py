"""Batched JAX transmitter: one jit program from PSDU bytes to IQ samples.

TPU-native re-design of the reference TX chain (pktgen->encode->modulation->
IFFT/CP->pad, SURVEY.md §3.2): for a static (Mod, PpduParams) config the
entire preamble (training fields + SIG fields) is a config constant
precomputed by the golden model; only the DATA field is computed on-device —
scramble (PRBS XOR), BCC (shift-XOR taps), puncture/interleave (gathers),
QAM (table lookup), pilot insertion (static scatter), IFFT (batched), GI and
boundary windowing (static scale mask). Everything is batched over packets.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..specs import BW, CR, F, M, Mod, PpduParams, tables
from ..specs import interleaver as ilv
from ..specs.modulation import (ppdu_params_aggregate, ppdu_params_nonaggregate)
from ..utils.riq import r_of
from . import golden


class TxPipeline:
    """Config-specialized batched transmitter."""

    def __init__(self, mod: Mod, pp: PpduParams,
                 scrambler: int = golden.DEFAULT_SCRAMBLER):
        assert not pp.mu, "MU TX uses the golden model for now"
        self.mod = mod
        self.pp = pp
        self.scrambler = scrambler
        self._prep()
        self.step = jax.jit(self._tx)

    # -- static precomputation ---------------------------------------------
    def _prep(self):
        mod, pp = self.mod, self.pp
        # preamble from the golden model with a zero payload: every sample
        # before the DATA field depends only on the config.
        # TX input length: raw A-MPDU bytes for VHT (EOF padding is added
        # on-device), MPDU bytes otherwise.
        self.in_len = pp.ampdu_len if mod.fmt == F.VHT else pp.psdu_len
        probe = bytes(self.in_len)
        if mod.fmt == F.L or (mod.fmt == F.HT and not pp.ampdu):
            ref = golden.gen_mpdu(probe, mod, self.scrambler)
        else:
            ref = golden.gen_ampdu(probe, mod, scrambler=self.scrambler)
        n_data_samp = pp.n_sym * 80
        wave = ref.waveform
        self.n_samp = wave.shape[-1]
        pre = wave[:, : self.n_samp - n_data_samp].astype(np.complex64)
        if pp.n_sym > 0:
            pre[:, -1] *= 1.0  # already halved by golden concat
        self.preamble = pre                                  # [nSS, nPre]
        self.sigb_crc = (ref.sigb_crc if ref.sigb_crc is not None
                         else np.zeros(0, np.int64))
        # scramble PRBS over the data-bit region
        n_dbits = 16 + 8 * pp.psdu_len + pp.n_pad_bits + \
            (6 * mod.nES if mod.fmt != F.VHT else 0)
        if mod.fmt == F.VHT:
            n_dbits = pp.n_sym * mod.nDBPS - 6 * mod.nES
        else:
            n_dbits = pp.n_sym * mod.nDBPS
        reps = -(-n_dbits // 127)
        self.prbs = np.tile(tables.SCRAMBLE_SEQ[self.scrambler],
                            reps)[:n_dbits].astype(np.int32)
        # fixed bit fields
        if mod.fmt == F.VHT:
            service = np.concatenate([np.zeros(8, np.int32),
                                      self.sigb_crc.astype(np.int32)])
            eof = np.tile(tables.EOF_PAD_SUBFRAME.astype(np.int32),
                          pp.n_pad_eof)
            self.fixed_tail = np.concatenate(
                [eof, np.zeros(8 * pp.n_pad_octet + pp.n_pad_bits, np.int32)])
        else:
            service = np.zeros(16, np.int32)
            self.fixed_tail = np.zeros(6 * mod.nES + pp.n_pad_bits, np.int32)
        self.service = service
        # puncture keep indices over one encoder's coded stream
        n_in = pp.n_sym * mod.nDBPS // mod.nES
        pat = tables.PUNCTURE[mod.cr].astype(bool)
        keep = np.tile(pat, -(-2 * n_in // len(pat)))[:2 * n_in]
        self.punct_idx = np.nonzero(keep)[0].astype(np.int32)
        # stream parser & interleaver gathers
        self.es_idx, self.bit_idx = ilv.stream_parser_maps(mod)
        self.tx_perms = np.stack([ilv.tx_perm(mod, iss)
                                  for iss in range(mod.nSS)])
        # pilots per symbol/stream
        self.pilots = np.stack([golden.pilot_sequence(mod, pp.n_sym, iss)
                                for iss in range(mod.nSS)])  # [nSS,S,nP]
        # CSD phasor per stream on the grid
        tab = tables.CSD_NONLEGACY_NS
        self.csd = np.stack([
            golden.csd_phase(mod.bw, tab[mod.nSS - 1, iss])
            for iss in range(mod.nSS)]).astype(np.complex64)  # [nSS, nfft]
        if mod.fmt == F.L:
            self.scale = np.float32(np.sqrt(tables.SCALE_DATA_L[mod.bw]
                                            * mod.nSS))
        elif mod.fmt == F.HT:
            self.scale = np.float32(np.sqrt(tables.SCALE_DATA_HT[mod.bw]
                                            * mod.nSS))
        else:
            self.scale = np.float32(np.sqrt(tables.SCALE_DATA_VHT[mod.bw]
                                            * mod.nSS))
        # boundary window: halve symbol edges; last sample of last symbol
        # stays (it is the packet end)
        w = np.ones((pp.n_sym, 80), np.float32)
        w[:, 0] = 0.5
        w[:-1, -1] = 0.5
        self.window = w
        self.qam_r = np.real(tables.QAM_TAB[mod.mod]).astype(np.float32)
        self.qam_i = np.imag(tables.QAM_TAB[mod.mod]).astype(np.float32)

    # -- the jitted program --------------------------------------------------
    def _tx(self, psdu: jnp.ndarray) -> jnp.ndarray:
        """psdu: [B, psdu_len] uint8 -> waveform [B, nSS, nSamp, 2] f32."""
        mod, pp = self.mod, self.pp
        b = psdu.shape[0]
        bits = ((psdu[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
                ).astype(jnp.int32).reshape(b, -1)
        dbits = jnp.concatenate(
            [jnp.tile(jnp.asarray(self.service)[None], (b, 1)), bits,
             jnp.tile(jnp.asarray(self.fixed_tail)[None], (b, 1))], axis=1)
        scr = dbits ^ jnp.asarray(self.prbs)[None]
        if mod.fmt == F.VHT:
            # per-encoder stride slice + zero tail, then BCC
            n_in = pp.n_sym * mod.nDBPS // mod.nES - 6
            es = jnp.stack([
                jnp.concatenate([scr[:, ies: n_in * mod.nES: mod.nES],
                                 jnp.zeros((b, 6), jnp.int32)], axis=1)
                for ies in range(mod.nES)], axis=1)     # [B, nES, nIn+6]
        else:
            t0 = 16 + pp.psdu_len * 8
            scr = scr.at[:, t0: t0 + 6 * mod.nES].set(0)
            n_in = pp.n_sym * mod.nDBPS // mod.nES
            es = jnp.stack([scr[:, ies: n_in * mod.nES: mod.nES]
                            for ies in range(mod.nES)], axis=1)
        coded = self._bcc(es)                           # [B, nES, 2*nIn]
        punct = coded[:, :, jnp.asarray(self.punct_idx)]
        punct = punct.reshape(b, mod.nES, pp.n_sym, -1)  # [B,nES,S,cbps/es]
        # stream parse + interleave + QAM per stream
        grids = []
        for iss in range(mod.nSS):
            if mod.fmt == F.L:
                stream = punct[:, 0]
            else:
                stream = punct[:, jnp.asarray(self.es_idx[iss]), :,
                               jnp.asarray(self.bit_idx[iss])]
                stream = jnp.moveaxis(stream, 0, -1)    # [B, S, nCBPSS]
            inted = stream[..., jnp.asarray(self.tx_perms[iss])]
            chips = inted.reshape(b, pp.n_sym, mod.nSD, mod.nBPSCS)
            chips = jnp.sum(chips * (1 << jnp.arange(mod.nBPSCS)), axis=-1)
            qam = (jnp.asarray(self.qam_r)[chips]
                   + 1j * jnp.asarray(self.qam_i)[chips])  # [B, S, nSD]
            nfft = tables.NFFT[mod.bw]
            grid = jnp.zeros((b, pp.n_sym, nfft), jnp.complex64)
            grid = grid.at[..., jnp.asarray(
                tables.DATA_GRID[(mod.bw, mod.fmt == F.L)])].set(qam)
            grid = grid.at[..., jnp.asarray(
                tables.PILOT_GRID[(mod.bw, mod.fmt == F.L)])].set(
                jnp.asarray(self.pilots[iss])[None].astype(jnp.complex64))
            grid = grid * jnp.asarray(self.csd[iss])[None, None, :]
            grids.append(grid)
        grids = jnp.stack(grids, axis=1)                # [B, nSS, S, nfft]
        sym = jnp.fft.ifft(jnp.fft.ifftshift(grids, axes=-1), axis=-1)
        sym = sym / self.scale
        n = sym.shape[-1]
        sym = jnp.concatenate([sym[..., 3 * n // 4:], sym], axis=-1)
        sym = sym * jnp.asarray(self.window)[None, None]
        data = sym.reshape(b, self.mod.nSS, -1)
        pre = jnp.tile(jnp.asarray(self.preamble)[None], (b, 1, 1))
        return r_of(jnp.concatenate([pre, data], axis=-1))

    def _bcc(self, bits: jnp.ndarray) -> jnp.ndarray:
        """[..., N] int bits -> [..., 2N] rate-1/2 coded (zero state)."""
        n = bits.shape[-1]
        pad = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(6, 0)])

        def taps(mask):
            out = jnp.zeros_like(bits)
            for k in range(7):
                if (mask >> k) & 1:
                    out = out ^ jax.lax.slice_in_dim(pad, 6 - k, 6 - k + n,
                                                     axis=-1)
            return out

        o0 = taps(tables.G0)
        o1 = taps(tables.G1)
        return jnp.stack([o0, o1], axis=-1).reshape(*bits.shape[:-1], 2 * n)


@lru_cache(maxsize=64)
def get_tx_pipeline(mod: Mod, psdu_len: int, ampdu: bool) -> TxPipeline:
    if mod.fmt == F.VHT or (mod.fmt == F.HT and ampdu):
        pp = ppdu_params_aggregate(mod, psdu_len)
    else:
        pp = ppdu_params_nonaggregate(mod, psdu_len)
    return TxPipeline(mod, pp)
