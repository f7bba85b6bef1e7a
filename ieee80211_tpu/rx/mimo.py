"""2x2 SU-MIMO receiver: dual-chain sync, MIMO channel est, ZF equalizer.

TPU-native re-design of the reference 2x2 stack (signal2 + demod2,
SURVEY.md §2 C5/C7): both RX chains are decoded as one batched tensor
program — P-matrix channel estimation from the two HT/VHT-LTFs, per-tone
2x2 Gram-inverse ZF equalization, joint two-stream pilot phase tracking,
per-stream deinterleave and stream-deparser, one Viterbi over the re-merged
coded stream. (Math parity: lib/demod2_impl.cc:374-530.)
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import coding, demod, sync
from ..specs import BW, CR, F, M, Mod, tables
from ..specs import interleaver as ilv
from ..utils.riq import r2c
from .receiver import (OFF_LSIG, OFF_NLLTF, PacketResult, assemble_packet,
                       parse_ht_sig, parse_vht_siga, sig_parse)


@lru_cache(maxsize=None)
def _deparser_gather(mod: Mod):
    """Per-encoder gather maps [nES][nCBPS/nES]: coded-bit i of encoder e
    <- (stream, pos). (The reference's stream parser is dormant/buggy for
    nES>=2, tests/test_specs_vs_reference.py — ours follows the standard.)"""
    ss_idx, pos_idx = ilv.stream_deparser_maps(mod)
    return ss_idx.astype(np.int32), pos_idx.astype(np.int32)


def _pilot_obs_ref(mod: Mod, h_pil: jnp.ndarray, n_sym: int, pidx0: int):
    """Expected pilot observations per RX chain [B, S, nRx, nP].

    h_pil: [B, nP, nRx, nSTS] channel rows at pilot bins (for VHT this is
    the *sum* channel replicated; see mimo channel estimation note).
    """
    if mod.fmt == F.HT:
        pats = np.stack([tables.PILOT_HT[mod.bw][mod.nSS - 1][iss]
                         for iss in range(mod.nSS)])     # [nSTS, nP]
        refs = np.stack([np.asarray(
            demod.pilot_refs(mod, n_sym, pidx0, iss))
            for iss in range(mod.nSS)])                  # [nSTS, S, nP]
        # y_exp[r, k, n] = sum_s H[r, s, k] * p_s[k, n]
        return jnp.einsum("bprs,snp->bnrp", h_pil, jnp.asarray(refs))
    # VHT: same pilot values on every stream
    pref = jnp.asarray(np.asarray(demod.pilot_refs(mod, n_sym, pidx0)))
    hsum = jnp.sum(h_pil, axis=-1)                       # [B, nP, nRx]
    return jnp.einsum("bpr,np->bnrp", hsum, pref)


class MimoDataDecoder:
    """Batched 2-stream DATA decoder for one static (Mod, nSym) config."""

    def __init__(self, mod: Mod, n_sym: int, psdu_len: int):
        assert mod.nSS == 2
        self.mod = mod
        self.n_sym = n_sym
        self.psdu_len = psdu_len
        self.n_bits = n_sym * mod.nDBPS
        self.q = tables.NFFT[mod.bw] // 64
        self._fn = jax.jit(self._decode)

    def data_offset(self) -> int:
        n_ltf = self.mod.nLTF
        if self.mod.fmt == F.HT:
            off = OFF_NLLTF + 80 * n_ltf
        else:
            off = OFF_NLLTF + 80 * n_ltf + 80    # VHT: + SIG-B
        return off * self.q

    def _decode(self, x2: jnp.ndarray, ltf_start: jnp.ndarray,
                cfo: jnp.ndarray):
        """x2: [B, nRx=2, N, 2] float32; ltf_start, cfo: [B] (from chain 0).
        Returns descrambled bits [B, n_bits]."""
        mod = self.mod
        q = self.q
        nfft, gi, sh = 64 * q, 16 * q, 8 * q
        b = x2.shape[0]
        x = r2c(x2)                                       # [B, 2, N]
        y = x * jnp.exp(1j * cfo[:, None, None]
                        * jnp.arange(x.shape[-1])[None, None, :])
        yf = y.reshape(b * 2, -1)
        ls2 = jnp.repeat(ltf_start, 2)

        # both chains' NL-LTF symbols -> [B, nRx, nLtf, nfft]
        ltf_t = demod.extract_symbol_windows(yf, ls2 + OFF_NLLTF * q, 2,
                                             nfft=nfft, gi=gi, shift=sh)
        ltf_f = demod.fft_syms(ltf_t).reshape(b, 2, 2, nfft)
        h = demod.mimo_chan_est_2x2(ltf_f, mod.bw, vht=mod.fmt == F.VHT)
        # h: [B, 64, nRx, nSTS]; at VHT pilot tones this holds sumH/ref in
        # every stream column / 2 (since both LTFs carry R*ref there):
        # mimo_chan_est combines with P, giving [sum/2, sum/2] columns *
        # P-row structure — recover the sum channel at pilots directly:
        pil_bins = jnp.asarray(tables.PILOT_GRID[(mod.bw, False)])
        ref = jnp.asarray(demod.ltf_ref_grid(mod.bw, False))
        ltf1_pil = ltf_f[:, :, 0, :][..., pil_bins]       # [B, nRx, nP]
        sum_h_pil = ltf1_pil / ref[pil_bins][None, None, :]

        # data symbols on both chains
        gd = demod.fft_syms(demod.extract_symbol_windows(
            yf, ls2 + self.data_offset(), self.n_sym,
            nfft=nfft, gi=gi, shift=sh)).reshape(
                b, 2, self.n_sym, nfft)
        pidx0 = 3 if mod.fmt == F.HT else 4

        # joint pilot phase tracking across chains
        if mod.fmt == F.HT:
            h_pil = h[:, pil_bins]                        # [B, nP, nRx, nSTS]
            exp_obs = _pilot_obs_ref(mod, h_pil, self.n_sym, pidx0)
        else:
            exp_obs = _pilot_obs_ref(
                mod, jnp.moveaxis(sum_h_pil, -1, 1)[..., None],
                self.n_sym, pidx0)
        obs = gd[..., pil_bins]                           # [B, nRx, S, nP]
        obs = jnp.moveaxis(obs, 1, 2)                     # [B, S, nRx, nP]
        acc = jnp.sum(obs * jnp.conj(exp_obs), axis=(-1, -2))
        ph = acc / jnp.maximum(jnp.abs(acc), 1e-12)       # [B, S]
        gd = gd / ph[:, None, :, None]

        # ZF equalize the data bins
        xhat = demod.mimo_equalize_2x2(gd, h)             # [B, 2, S, nfft]
        data_bins = jnp.asarray(tables.DATA_GRID[(mod.bw, False)])
        data = xhat[..., data_bins]                       # [B, 2, S, nSD]
        llr = demod.demap_llr(data, mod.mod)              # [B, 2, S, nCBPSS]
        # per-stream deinterleave
        llr = jnp.stack([llr[:, iss][..., jnp.asarray(ilv.rx_perm(mod, iss))]
                         for iss in range(2)], axis=1)
        # stream deparser: re-merge into per-encoder order per symbol
        ss_idx, pos_idx = _deparser_gather(self.mod)      # [nES, nCBPS/nES]
        n_es = mod.nES
        if n_es == 1:
            merged = llr[:, jnp.asarray(ss_idx[0]), :,
                         jnp.asarray(pos_idx[0])]
            merged = jnp.moveaxis(merged, 0, -1)          # [B, S, nCBPS]
            bits = coding.viterbi_decode(merged.reshape(b, -1), mod.cr,
                                         self.n_bits)
        else:
            # per-encoder Viterbi lanes, then round-robin re-merge of the
            # decoded bits (encoder ies carried scrambled-stream bits
            # ies::nES; each encoder ends in its own 6-bit zero tail)
            dec_es = []
            for ies in range(n_es):
                me = llr[:, jnp.asarray(ss_idx[ies]), :,
                         jnp.asarray(pos_idx[ies])]
                me = jnp.moveaxis(me, 0, -1).reshape(b, -1)
                dec_es.append(coding.viterbi_decode(
                    me, mod.cr, self.n_bits // n_es))
            bits = jnp.stack(dec_es, axis=-1).reshape(b, -1)
        return coding.descramble(bits)

    def decode(self, x2, ltf_start, cfo) -> np.ndarray:
        return np.asarray(self._fn(x2, ltf_start, cfo))


@lru_cache(maxsize=64)
def get_mimo_decoder(mod: Mod, n_sym: int, psdu_len: int) -> MimoDataDecoder:
    return MimoDataDecoder(mod, n_sym, psdu_len)


class MimoReceiver:
    """Auto-detecting 2x2 receiver over dual-chain captures [2, N]."""

    def __init__(self, sample_rate_hz: float = 20e6):
        self.fs = sample_rate_hz
        self.q = int(round(sample_rate_hz / 20e6))
        if self.q not in (1, 2, 4):
            raise ValueError("sample rate must be 20/40/80 MHz")
        self.bw = {1: BW.BW20, 2: BW.BW40, 4: BW.BW80}[self.q]

    def decode_capture(self, capture: np.ndarray) -> List[PacketResult]:
        from .receiver import SIGPARSE_WIN
        capture = np.asarray(capture, dtype=np.complex64)
        assert capture.ndim == 2 and capture.shape[0] == 2
        t0s = sync.find_triggers_np(capture[0], q=self.q)
        results: List[PacketResult] = []
        if len(t0s) == 0:
            return results
        # pass 1: small chain-0 preamble windows for SIG parse; pass 2 cuts
        # exact-extent dual-chain data windows (spurious non-legacy-STF
        # re-triggers fail L-SIG and are dropped)
        wlen = min((SIGPARSE_WIN + 320) * self.q, capture.shape[1])
        xs0 = np.zeros((len(t0s), wlen, 2), dtype=np.float32)
        for i, t in enumerate(t0s):
            seg = capture[0, t:t + wlen]
            xs0[i, :len(seg), 0] = np.real(seg)
            xs0[i, :len(seg), 1] = np.imag(seg)
        t0 = np.zeros(len(t0s), dtype=np.int32)
        meta = {k: np.asarray(v) for k, v in
                sig_parse(jnp.asarray(xs0), jnp.asarray(t0),
                          q=self.q).items()}
        for i in range(len(t0s)):
            r = self._decode_one(capture, int(t0s[i]), meta, i)
            if r is not None:
                results.append(r)
        return results

    def _data_window(self, capture: np.ndarray, t_abs: int,
                     need: int) -> np.ndarray:
        w = np.zeros((1, 2, need, 2), dtype=np.float32)
        seg = capture[:, t_abs:t_abs + need]
        w[0, :, :seg.shape[1], 0] = np.real(seg)
        w[0, :, :seg.shape[1], 1] = np.imag(seg)
        return w

    def _decode_one(self, capture, t_abs: int, meta,
                    i) -> Optional[PacketResult]:
        if not bool(meta["lsig_ok"][i]) or int(meta["l_mcs"][i]) != 0:
            return None
        cfo_hz = float(meta["cfo"][i]) * self.fs / (2 * np.pi) * -1.0
        snr = float(meta["snr"][i])
        ltf_start = np.asarray([meta["ltf_start"][i]], dtype=np.int32)
        cfo = np.asarray([meta["cfo"][i]], dtype=np.float32)
        l_len = int(meta["l_len"][i])
        from ..specs.modulation import ppdu_params_nonaggregate
        from .receiver import _pick_nl_format
        fmt = _pick_nl_format(meta, i)

        def extent(mod, n_sym):
            return int(ltf_start[0]) + (448 + 80 * mod.nLTF + 160
                                        + n_sym * 80) * self.q

        if fmt == F.VHT:
            bw, gid, nsts, paid, sgi, mcs = parse_vht_siga(meta["vht_bits"][i])
            if bw != self.bw or sgi or nsts != 2:
                return None
            mod = Mod(F.VHT, mcs, bw, nsts, sgi)
            n_sym_l = int(np.ceil((l_len * 8 + 16 + 6) / 24))
            n_sym = n_sym_l - 2 - 1 - mod.nLTF - 1
            if n_sym <= 0:
                return None          # NDP -> mu/feedback path
            need = extent(mod, n_sym)
            if t_abs + need > capture.shape[1] or n_sym * mod.nDBPS > 33000:
                return None
            psdu_len = (n_sym * mod.nDBPS - 16 - 6 * mod.nES) // 8
            dec = get_mimo_decoder(mod, n_sym, psdu_len)
            bits = dec.decode(
                jnp.asarray(self._data_window(capture, t_abs, need)),
                jnp.asarray(ltf_start), jnp.asarray(cfo))[0]
            return assemble_packet(F.VHT, mod, psdu_len, bits, True,
                                   cfo_hz, snr)
        if fmt == F.HT:
            mcs, bw, length, aggre, sgi = parse_ht_sig(meta["ht_bits"][i])
            if bw != self.bw or sgi or not (8 <= mcs <= 15):
                return None
            mod = Mod(F.HT, mcs, bw, 2, sgi)
            pp = ppdu_params_nonaggregate(mod, length)
            need = extent(mod, pp.n_sym)
            if (t_abs + need > capture.shape[1]
                    or not (1 <= length <= 4095)):
                return None
            dec = get_mimo_decoder(mod, pp.n_sym, length)
            bits = dec.decode(
                jnp.asarray(self._data_window(capture, t_abs, need)),
                jnp.asarray(ltf_start), jnp.asarray(cfo))[0]
            return assemble_packet(F.HT, mod, length, bits, aggre,
                                   cfo_hz, snr)
        return None
