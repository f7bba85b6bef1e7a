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
from .receiver import (N_SYM_BUCKET, OFF_LSIG, OFF_NLLTF, PacketResult,
                       _bucket, assemble_packet, parse_ht_sig,
                       parse_vht_siga, sig_parse_mimo)


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
    """Batched 2-stream DATA decoder for one static (Mod, nSym-bucket).

    n_sym is the compiled symbol capacity; true per-packet symbol counts
    pass through `n_valid` with LLRs past the true extent zeroed
    (path-neutral in the Viterbi) — one compilation serves every packet
    length in the bucket, same as SisoDataDecoder."""

    def __init__(self, mod: Mod, n_sym: int, detector: str = "ml"):
        assert mod.nSS == 2
        assert detector in ("ml", "zf")
        self.mod = mod
        self.n_sym = n_sym
        self.detector = detector
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
                cfo: jnp.ndarray, n_valid: jnp.ndarray = None):
        """x2: [B, nRx=2, N, 2] float32; ltf_start, cfo: [B];
        n_valid: optional [B] int32 true symbol counts (<= self.n_sym).
        Returns (descrambled bits [B, n_bits], evm_snr_db [B])."""
        mod = self.mod
        q = self.q
        nfft, gi, sh = 64 * q, 16 * q, 8 * q
        b = x2.shape[0]
        x = r2c(x2)                                       # [B, 2, N]
        y = x * sync.cfo_ramp(cfo, x.shape[-1])[:, None, :]
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
        sym_m = None
        if n_valid is not None:
            sym_m = (jnp.arange(self.n_sym, dtype=jnp.int32)[None, :]
                     < n_valid[:, None])                  # [B, S]
        evm = demod.evm_snr_db(
            data, mod.mod, axes=(-3, -2, -1),
            sym_mask=None if sym_m is None else sym_m[:, None, :])
        if self.detector == "ml":
            # max-log ML detection (exact for 2 streams) instead of the ZF
            # hard split — decodes dense constellations through channels
            # whose conditioning defeats the reference's Gram-inverse
            # equalizer (lib/demod2_impl.cc:410-428)
            llr = demod.ml_detect_llr_2x2(
                gd[..., data_bins], h[:, data_bins], mod.mod)
        else:                              # "zf": reference-parity detector
            llr = demod.demap_llr(data, mod.mod)          # [B, 2, S, nCBPSS]
        # per-stream deinterleave
        llr = jnp.stack([llr[:, iss][..., jnp.asarray(ilv.rx_perm(mod, iss))]
                         for iss in range(2)], axis=1)
        # stream deparser: re-merge into per-encoder order per symbol
        ss_idx, pos_idx = _deparser_gather(self.mod)      # [nES, nCBPS/nES]
        n_es = mod.nES

        def mask_syms(m):
            """Zero LLRs of bucket-padding symbols past the true extent."""
            if sym_m is None:
                return m
            return jnp.where(sym_m[..., None], m, 0.0)
        if n_es == 1:
            merged = llr[:, jnp.asarray(ss_idx[0]), :,
                         jnp.asarray(pos_idx[0])]
            merged = jnp.moveaxis(merged, 0, -1)          # [B, S, nCBPS]
            bits = coding.viterbi_decode(
                mask_syms(merged).reshape(b, -1), mod.cr, self.n_bits)
        else:
            # per-encoder Viterbi lanes, then round-robin re-merge of the
            # decoded bits (encoder ies carried scrambled-stream bits
            # ies::nES; each encoder ends in its own 6-bit zero tail)
            dec_es = []
            for ies in range(n_es):
                me = llr[:, jnp.asarray(ss_idx[ies]), :,
                         jnp.asarray(pos_idx[ies])]
                me = mask_syms(jnp.moveaxis(me, 0, -1)).reshape(b, -1)
                dec_es.append(coding.viterbi_decode(
                    me, mod.cr, self.n_bits // n_es))
            bits = jnp.stack(dec_es, axis=-1).reshape(b, -1)
        return coding.descramble(bits), evm

    def decode(self, x2, ltf_start, cfo, n_valid=None):
        bits, evm = self._fn(x2, ltf_start, cfo, n_valid)
        return np.asarray(bits), np.asarray(evm)

    def window_capacity(self) -> int:
        return (272 * self.q + self.data_offset()
                + (self.n_sym * 80 + 80) * self.q)

    def _decode_from_capture(self, cap, scale, t_abs, ltf_start, cfo,
                             n_valid):
        from .receiver import capture_windows_mimo, pack_bits_le
        w = self.window_capacity()
        x2 = capture_windows_mimo(cap, t_abs, w).astype(jnp.float32) * scale
        bits, evm = self._decode(x2, ltf_start, cfo, n_valid)
        return pack_bits_le(bits), evm

    def decode_from_capture(self, cap, scale, t_abs, ltf_start, cfo,
                            n_valid):
        """Async dispatch over the device-resident dual-chain capture."""
        if not hasattr(self, "_fn_cap"):
            self._fn_cap = jax.jit(self._decode_from_capture)
        return self._fn_cap(cap, scale, t_abs, ltf_start, cfo, n_valid)


@lru_cache(maxsize=64)
def get_mimo_decoder(mod: Mod, n_sym_bucket: int) -> MimoDataDecoder:
    return MimoDataDecoder(mod, n_sym_bucket)


def merge_triggers(per_chain: List[np.ndarray], dedup_gap: int) -> np.ndarray:
    """Union of per-chain trigger positions, deduplicated within dedup_gap.

    Triggering on every chain (not only chain 0, as the reference's rx2.grc
    wiring does) keeps detection alive when one chain's channel fades."""
    t_all = np.sort(np.concatenate([np.asarray(t) for t in per_chain]))
    merged: List[int] = []
    last = -dedup_gap
    for t in t_all:
        if t - last >= dedup_gap:
            merged.append(int(t))
            last = int(t)
    return np.asarray(merged, dtype=np.int64)


class MimoReceiver:
    """Auto-detecting 2x2 receiver over dual-chain captures [2, N].

    Batched like SisoReceiver: one capture upload, one MRC SIG-parse
    dispatch (packed meta fetch), one decode dispatch per (Mod, bucket)
    group with bytes fetched back.
    """

    def __init__(self, sample_rate_hz: float = 20e6, stats=None,
                 ingest: str = "auto"):
        self.fs = sample_rate_hz
        self.q = int(round(sample_rate_hz / 20e6))
        if self.q not in (1, 2, 4):
            raise ValueError("sample rate must be 20/40/80 MHz")
        if ingest not in ("auto", "f32", "int8"):
            raise ValueError("ingest must be 'auto', 'f32' or 'int8'")
        self.bw = {1: BW.BW20, 2: BW.BW40, 4: BW.BW80}[self.q]
        self.ingest = ingest
        from ..utils.metrics import DecodeStats
        self.stats = stats if stats is not None else DecodeStats()

    def _upload(self, capture: np.ndarray):
        """See SisoReceiver._upload: auto = f32 below 32 MB, int8 above
        (relay upload cliff); per-chain native peak quantization."""
        from .receiver import next_pow2
        capture = np.ascontiguousarray(capture, dtype=np.complex64)
        n = capture.shape[1]
        npad = next_pow2(n + 4096, lo=1 << 15)
        mode = self.ingest
        if mode == "auto":
            mode = "int8" if npad > (1 << 19) else "f32"
        if mode == "int8":
            peak = float(max(np.abs(capture.real).max(initial=0.0),
                             np.abs(capture.imag).max(initial=0.0), 1e-12))
            s = 126.0 / peak
            buf = np.zeros((2, npad, 2), np.int8)
            buf[:, :n, 0] = np.clip(np.round(capture.real * s), -127, 127)
            buf[:, :n, 1] = np.clip(np.round(capture.imag * s), -127, 127)
            return jnp.asarray(buf), jnp.float32(1.0 / s), npad
        buf = np.zeros((2, npad, 2), np.float32)
        buf[:, :n] = capture.view(np.float32).reshape(2, -1, 2)
        return jnp.asarray(buf), jnp.float32(1.0), npad

    def decode_capture(self, capture: np.ndarray) -> List[PacketResult]:
        from .receiver import (SIGPARSE_WIN, _unpack_meta,
                               sig_parse_mimo_capture)
        capture = np.asarray(capture, dtype=np.complex64)
        assert capture.ndim == 2 and capture.shape[0] == 2
        t0s = merge_triggers(
            [sync.find_triggers_np(capture[c], q=self.q) for c in range(2)],
            dedup_gap=200 * self.q)
        results: List[PacketResult] = []
        if len(t0s) == 0:
            return results
        cap_dev, scale, npad = self._upload(capture)
        wlen = (SIGPARSE_WIN + 320) * self.q
        bpad = -(-len(t0s) // 32) * 32
        t_clamp = np.zeros(bpad, np.int32)
        delta = np.zeros(bpad, np.int32)
        tc = np.minimum(t0s, npad - wlen)
        t_clamp[:len(t0s)] = tc
        delta[:len(t0s)] = t0s - tc
        packed = sig_parse_mimo_capture(cap_dev, scale, jnp.asarray(t_clamp),
                                        jnp.asarray(delta), wlen=wlen,
                                        q=self.q)
        meta = _unpack_meta(np.asarray(packed))
        meta["win_start"] = t_clamp
        self.stats.n_trigger += len(t0s)
        self.stats.n_sig_ok += int(np.sum(meta["lsig_ok"][:len(t0s)]))
        plans = []
        for i in range(len(t0s)):
            p = self._plan_one(capture.shape[1], meta, i)
            if p is not None and not p.ndp:
                plans.append((i, p))
        for i, r in self._run_plans(cap_dev, scale, npad, plans):
            self.stats.record(r.fmt.name, r.mcs, r.fcs_ok)
            results.append(r)
        return results

    def _run_plans(self, cap_dev, scale, npad, plans):
        from .receiver import assemble_psdu, next_pow2
        groups: dict = {}
        for i, p in plans:
            groups.setdefault((p.mod, _bucket(p.n_sym)), []).append((i, p))
        futs = []
        for (mod, nb), items in groups.items():
            dec = get_mimo_decoder(mod, nb)
            w = dec.window_capacity()
            g = len(items)
            gp = next_pow2(g)
            t_abs = np.zeros(gp, np.int32)
            ltf = np.zeros(gp, np.int32)
            cfo = np.zeros(gp, np.float32)
            nv = np.ones(gp, np.int32)
            for j, (i, p) in enumerate(items):
                tc = min(p.win_start, npad - w)
                t_abs[j] = tc
                ltf[j] = p.ltf_start + (p.win_start - tc)
                cfo[j] = p.cfo
                nv[j] = p.n_sym
            if gp > g:
                t_abs[g:] = t_abs[0]
                ltf[g:] = ltf[0]
                cfo[g:] = cfo[0]
                nv[g:] = nv[0]
            out = dec.decode_from_capture(
                cap_dev, scale, jnp.asarray(t_abs), jnp.asarray(ltf),
                jnp.asarray(cfo), jnp.asarray(nv))
            futs.append((items, out))
        # overlap all device->host copies (one relay round-trip total;
        # see SisoReceiver._run_plans)
        for _, (pb, ev) in futs:
            pb.copy_to_host_async()
            ev.copy_to_host_async()
        collected = []
        for items, (packed_b, evm) in futs:
            pb = np.asarray(packed_b)
            ev = np.asarray(evm)
            for j, (i, p) in enumerate(items):
                psdu = pb[j, 2:2 + p.psdu_len].tobytes()
                collected.append((i, assemble_psdu(
                    p.mod.fmt, p.mod, psdu, p.ampdu, p.cfo_hz, p.snr,
                    float(ev[j]))))
        collected.sort(key=lambda t: t[0])
        return collected

    def _plan_one(self, cap_len: int, meta, i):
        from ..specs.modulation import ppdu_params_nonaggregate
        from .receiver import _Plan, _pick_nl_format
        # sync gate (drops mid-packet re-triggers; parity with the SISO
        # receiver and lib/sync_impl.cc:99's ac>0.5 peak requirement)
        if float(meta["snr"][i]) <= 0.0:
            return None
        # L-SIG validity is tracked but NOT a hard gate for HT: the HT-SIG
        # carries its own length + CRC-8, so a packet whose MRC-combined
        # L-SIG still fails (but whose HT-SIG checks out) is recoverable.
        # (The reference hard-drops these, lib/signal2_impl.cc:113-127.)
        lsig_data = bool(meta["lsig_ok"][i]) and int(meta["l_mcs"][i]) == 0
        win_start = int(meta["win_start"][i])
        ltf_start = int(meta["ltf_start"][i])
        cfo = float(meta["cfo"][i])
        cfo_hz = cfo * self.fs / (2 * np.pi) * -1.0
        snr = float(meta["snr"][i])
        l_len = int(meta["l_len"][i])
        fmt = _pick_nl_format(meta, i)

        def extent(mod, n_sym):
            return ltf_start + (448 + 80 * mod.nLTF + 160
                                + n_sym * 80) * self.q

        if fmt == F.VHT:
            if not lsig_data:
                return None          # VHT nSym derives from the L-SIG length
            bw, gid, nsts, paid, sgi, mcs = parse_vht_siga(meta["vht_bits"][i])
            if bw != self.bw or sgi or nsts != 2:
                return None
            mod = Mod(F.VHT, mcs, bw, nsts, sgi)
            n_sym_l = int(np.ceil((l_len * 8 + 16 + 6) / 24))
            n_sym = n_sym_l - 2 - 1 - mod.nLTF - 1
            if n_sym <= 0:
                return _Plan(mod, 0, 0, False, win_start, ltf_start, cfo,
                             cfo_hz, snr, ndp=True)
            if (win_start + extent(mod, n_sym) > cap_len
                    or n_sym * mod.nDBPS > 33000):
                return None
            psdu_len = (n_sym * mod.nDBPS - 16 - 6 * mod.nES) // 8
            return _Plan(mod, n_sym, psdu_len, True, win_start, ltf_start,
                         cfo, cfo_hz, snr)
        if fmt == F.HT:
            mcs, bw, length, aggre, sgi = parse_ht_sig(meta["ht_bits"][i])
            if bw != self.bw or sgi or not (8 <= mcs <= 15):
                return None
            mod = Mod(F.HT, mcs, bw, 2, sgi)
            pp = ppdu_params_nonaggregate(mod, length)
            if (win_start + extent(mod, pp.n_sym) > cap_len
                    or not (1 <= length <= 4095)):
                return None
            return _Plan(mod, pp.n_sym, length, aggre, win_start, ltf_start,
                         cfo, cfo_hz, snr)
        return None
