"""PDR-vs-SNR sweep harness.

Re-creation of the reference statistical integration tests
(tools/performance/perf_siso.py:87-180 + gr_siso.py AWGN loop): N packets
per (MCS, SNR) point are impaired with calibrated AWGN and pushed through
the *full* RX chain (sync, CFO, SIG, demod, Viterbi, FCS); the packet
delivery ratio curve is the acceptance metric. All N packets of a point are
decoded as one batch on-device; noise is generated on-device too.

Reference operating point: 500 B random payload, signal amplitude 0.1875,
SNR 0..30 dB (perf_siso.py:92,126-129; noise amp = amp / 10^(SNR/20),
phy80211header.py:1412).
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..mac import MacConfig, aggregate_vht, build_udp_mpdu, deaggregate_vht
from ..models import RxPipeline
from ..specs import BW, F, Mod
from ..specs.crc import fcs_ok
from ..specs.modulation import (ppdu_params_aggregate, ppdu_params_nonaggregate)
from ..tx import finalize, gen_ampdu, gen_mpdu
from ..utils import c2r

MAC_CFG = MacConfig(addr1="f4:69:d5:80:0f:a0", addr2="00:c0:ca:b1:5b:e1",
                    addr3="f4:69:d5:80:0f:a0", seq=2704)
MAC_CFG_QOS = MacConfig(subtype=8, addr1="f4:69:d5:80:0f:a0",
                        addr2="00:c0:ca:b1:5b:e1",
                        addr3="f4:69:d5:80:0f:a0", seq=2704)

SIG_AMP = 0.1875   # reference LTF rms amplitude (perf_siso.py:92)


def _build_packet(fmt: F, mcs: int, payload_len: int, seed: int = 0):
    payload = bytes(np.random.default_rng(seed).integers(
        0, 256, payload_len, dtype=np.uint8))
    if fmt == F.VHT:
        mpdu = build_udp_mpdu(payload, MAC_CFG_QOS)
        ampdu = aggregate_vht([mpdu])
        mod = Mod(fmt, mcs)
        tx = gen_ampdu(ampdu, mod)
        pp = ppdu_params_aggregate(mod, len(ampdu))
    else:
        mpdu = build_udp_mpdu(payload, MAC_CFG)
        mod = Mod(fmt, mcs)
        tx = gen_mpdu(mpdu, mod)
        pp = ppdu_params_nonaggregate(mod, len(mpdu))
    # scale so the time-domain rms over the LTF matches the reference amp
    ltf = tx.waveform[0, 160:320]
    scale = SIG_AMP / np.sqrt(np.mean(np.abs(ltf) ** 2))
    wave = finalize(tx.waveform, multiplier=scale, gap=True, gap_len=64)[0]
    return mod, pp, mpdu, wave


def pdr_point(pipe: RxPipeline, x2: np.ndarray, mpdu: bytes,
              noise_amp: float, key, ampdu: bool) -> float:
    """Decode one batch at one noise level; return the delivery ratio."""
    b = x2.shape[0]
    noise = jax.random.normal(key, x2.shape, dtype=jnp.float32) \
        * (noise_amp / np.sqrt(2))
    t0 = jnp.zeros(b, jnp.int32)
    out = pipe.step(jnp.asarray(x2) + noise, t0)
    bits = np.asarray(out["bits"]).astype(np.uint8)
    n_ok = 0
    for i in range(b):
        psdu = np.packbits(bits[i, 16:16 + pipe.psdu_len * 8],
                           bitorder="little").tobytes()
        if ampdu:
            subs = deaggregate_vht(psdu)
            ok = any(s.fcs_ok and s.mpdu == mpdu for s in subs)
        else:
            ok = fcs_ok(psdu) and psdu == mpdu
        n_ok += bool(ok)
    return n_ok / b


def pdr_sweep(fmt: F = F.VHT, mcs_list: Optional[Sequence[int]] = None,
              snr_db: Optional[Sequence[float]] = None, n_pkt: int = 100,
              payload_len: int = 500, seed: int = 0) -> Dict[int, List[float]]:
    """PDR curves per MCS over an SNR sweep (reference perf_siso semantics)."""
    if mcs_list is None:
        mcs_list = list(range(9)) if fmt == F.VHT else list(range(8))
    if snr_db is None:
        snr_db = list(range(0, 31))
    curves: Dict[int, List[float]] = {}
    key = jax.random.PRNGKey(seed)
    for mcs in mcs_list:
        mod, pp, mpdu, wave = _build_packet(fmt, mcs, payload_len, seed)
        pipe = RxPipeline(mod, pp.n_sym, pp.psdu_len)
        w = pipe.window_len()
        x = np.zeros(w, dtype=np.complex64)
        seg = wave[64 - 8:]
        x[:min(w, len(seg))] = seg[:min(w, len(seg))]
        x2 = np.tile(c2r(x)[None], (n_pkt, 1, 1))
        curve = []
        for s in snr_db:
            key, sub = jax.random.split(key)
            namp = SIG_AMP / (10 ** (s / 20))
            curve.append(pdr_point(pipe, x2, mpdu, namp, sub,
                                   ampdu=fmt == F.VHT))
        curves[mcs] = curve
    return curves


class MimoRxPipeline:
    """Fixed-config batched 2x2 RX: chain-0 sync + MIMO data decode.

    The 2-stream analog of models.RxPipeline, used by the MIMO PDR sweep
    (reference perf_sumimo.py semantics: known config, AWGN on both RX
    chains, full chain incl. sync/CFO/channel-est/ZF/Viterbi/FCS).
    """

    def __init__(self, mod: Mod, n_sym: int, psdu_len: int):
        from ..rx.mimo import MimoDataDecoder
        self.mod, self.n_sym, self.psdu_len = mod, n_sym, psdu_len
        self._dec = MimoDataDecoder(mod, n_sym)
        self.step = jax.jit(self._step)

    def window_len(self) -> int:
        from ..specs import tables
        extra = 80 if self.mod.fmt == F.VHT else 0
        q = tables.NFFT[self.mod.bw] // 64
        return (192 + 448 + 80 * self.mod.nLTF + extra
                + 80 * self.n_sym + 80) * q

    def _step(self, x2, t0):
        from ..ops import sync
        from ..specs import tables
        q = tables.NFFT[self.mod.bw] // 64
        ltf_start, cfo, snr = sync.sync_front_iq(x2[:, 0], t0, q=q)
        bits, _, _ = self._dec._decode(x2, ltf_start, cfo)
        return dict(bits=bits, ltf_start=ltf_start, cfo=cfo, snr=snr)


def _build_mimo_packet(fmt: F, mcs: int, payload_len: int, seed: int = 0):
    """2-stream (nSS=2) packet; HT mcs is the 2-stream index 8..15."""
    payload = bytes(np.random.default_rng(seed).integers(
        0, 256, payload_len, dtype=np.uint8))
    if fmt == F.VHT:
        mpdu = build_udp_mpdu(payload, MAC_CFG_QOS)
        ampdu = aggregate_vht([mpdu])
        mod = Mod(fmt, mcs, BW.BW20, 2)
        tx = gen_ampdu(ampdu, mod)
        pp = ppdu_params_aggregate(mod, len(ampdu))
    else:
        mpdu = build_udp_mpdu(payload, MAC_CFG)
        mod = Mod(F.HT, mcs, BW.BW20, 2)
        tx = gen_mpdu(mpdu, mod)
        pp = ppdu_params_nonaggregate(mod, len(mpdu))
    ltf = tx.waveform[0, 160:320]
    scale = SIG_AMP / np.sqrt(np.mean(np.abs(ltf) ** 2))
    wave = finalize(tx.waveform, multiplier=scale, gap=True, gap_len=64)
    return mod, pp, mpdu, wave                       # wave: [2, N]


def _build_packet_bw(bw: BW):
    """Builder factory: SISO VHT packets at 40/80 MHz (beyond the
    reference envelope — its RX is 20 MHz-only, signalCheckHt,
    lib/cloud80211phy.cc:744-748). Same (fmt, mcs, payload, seed)
    signature as _build_packet for the acceptance sweep."""
    from ..specs import tables

    def build(fmt: F, mcs: int, payload_len: int, seed: int = 0):
        q = tables.NFFT[bw] // 64
        payload = bytes(np.random.default_rng(seed).integers(
            0, 256, payload_len, dtype=np.uint8))
        mpdu = build_udp_mpdu(payload, MAC_CFG_QOS)
        ampdu = aggregate_vht([mpdu])
        mod = Mod(F.VHT, mcs, bw, 1)
        tx = gen_ampdu(ampdu, mod)
        pp = ppdu_params_aggregate(mod, len(ampdu))
        ltf = tx.waveform[0, 160 * q:320 * q]
        scale = SIG_AMP / np.sqrt(np.mean(np.abs(ltf) ** 2))
        wave = finalize(tx.waveform, multiplier=scale, gap=True,
                        gap_len=64 * q)[0]
        return mod, pp, mpdu, wave
    return build


def _build_mimo_packet_bw(bw: BW):
    """Builder factory: 2-stream packets at 40/80 MHz (HT mcs 8..15 or
    VHT nSTS=2 — doubly beyond the reference envelope)."""
    from ..specs import tables

    def build(fmt: F, mcs: int, payload_len: int, seed: int = 0):
        q = tables.NFFT[bw] // 64
        payload = bytes(np.random.default_rng(seed).integers(
            0, 256, payload_len, dtype=np.uint8))
        if fmt == F.VHT:
            mpdu = build_udp_mpdu(payload, MAC_CFG_QOS)
            ampdu = aggregate_vht([mpdu])
            mod = Mod(fmt, mcs, bw, 2)
            tx = gen_ampdu(ampdu, mod)
            pp = ppdu_params_aggregate(mod, len(ampdu))
        else:
            mpdu = build_udp_mpdu(payload, MAC_CFG)
            mod = Mod(F.HT, mcs, bw, 2)
            tx = gen_mpdu(mpdu, mod)
            pp = ppdu_params_nonaggregate(mod, len(mpdu))
        ltf = tx.waveform[0, 160 * q:320 * q]
        scale = SIG_AMP / np.sqrt(np.mean(np.abs(ltf) ** 2))
        wave = finalize(tx.waveform, multiplier=scale, gap=True,
                        gap_len=64 * q)
        return mod, pp, mpdu, wave                   # wave: [2, N]
    return build


def mimo_pdr_point(pipe: MimoRxPipeline, x2: np.ndarray, mpdu: bytes,
                   noise_amp: float, key, ampdu: bool) -> float:
    """One batch at one noise level; independent AWGN per RX chain."""
    b = x2.shape[0]
    noise = jax.random.normal(key, x2.shape, dtype=jnp.float32) \
        * (noise_amp / np.sqrt(2))
    t0 = jnp.zeros(b, jnp.int32)
    out = pipe.step(jnp.asarray(x2) + noise, t0)
    bits = np.asarray(out["bits"]).astype(np.uint8)
    n_ok = 0
    for i in range(b):
        psdu = np.packbits(bits[i, 16:16 + pipe.psdu_len * 8],
                           bitorder="little").tobytes()
        if ampdu:
            subs = deaggregate_vht(psdu)
            ok = any(s.fcs_ok and s.mpdu == mpdu for s in subs)
        else:
            ok = fcs_ok(psdu) and psdu == mpdu
        n_ok += bool(ok)
    return n_ok / b


def mimo_pdr_sweep(fmt: F = F.VHT, mcs_list: Optional[Sequence[int]] = None,
                   snr_db: Optional[Sequence[float]] = None, n_pkt: int = 100,
                   payload_len: int = 500, seed: int = 0
                   ) -> Dict[int, List[float]]:
    """2x2 SU-MIMO PDR curves (reference perf_sumimo.py analog).

    AWGN on both chains through the full 2-stream RX: sync, CFO, dual-LTF
    MIMO channel estimation, Gram-inverse ZF, joint pilot tracking, stream
    deparser, Viterbi, FCS.
    """
    if mcs_list is None:
        mcs_list = list(range(9)) if fmt == F.VHT else list(range(8, 16))
    if snr_db is None:
        snr_db = list(range(0, 31))
    curves: Dict[int, List[float]] = {}
    key = jax.random.PRNGKey(seed)
    for mcs in mcs_list:
        mod, pp, mpdu, wave = _build_mimo_packet(fmt, mcs, payload_len, seed)
        pipe = MimoRxPipeline(mod, pp.n_sym, pp.psdu_len)
        w = pipe.window_len()
        x = np.zeros((2, w), dtype=np.complex64)
        seg = wave[:, 64 - 8:]
        n = min(w, seg.shape[1])
        x[:, :n] = seg[:, :n]
        x2 = np.stack([np.real(x), np.imag(x)], axis=-1).astype(np.float32)
        x2 = np.tile(x2[None], (n_pkt, 1, 1, 1))         # [B, 2, W, 2]
        curve = []
        for s in snr_db:
            key, sub = jax.random.split(key)
            namp = SIG_AMP / (10 ** (s / 20))
            curve.append(mimo_pdr_point(pipe, x2, mpdu, namp, sub,
                                        ampdu=fmt == F.VHT))
        curves[mcs] = curve
    return curves


def main():
    import argparse
    ap = argparse.ArgumentParser(description="PDR vs SNR sweep")
    ap.add_argument("--fmt", default="VHT", choices=["L", "HT", "VHT"])
    ap.add_argument("--mcs", type=int, nargs="*", default=None)
    ap.add_argument("--snr", type=float, nargs="*", default=None)
    ap.add_argument("--npkt", type=int, default=100)
    ap.add_argument("--payload", type=int, default=500)
    args = ap.parse_args()
    curves = pdr_sweep(F[args.fmt], args.mcs, args.snr, args.npkt,
                       args.payload)
    print(json.dumps({str(k): v for k, v in curves.items()}))


if __name__ == "__main__":
    main()
