"""Batched SISO receiver: sync -> CFO -> SIG parse -> demod -> Viterbi -> MPDU.

TPU-native re-design of the reference RX stack (SURVEY.md §3.1: trigger ->
sync -> signal -> demod -> decode, lib/*_impl.cc): instead of streaming
blocks with tags, a capture is decoded as a batch of packet-aligned windows
through two jit programs:

  * `sig_parse` — config-independent: LTF sync, CFO, L-SIG + HT-SIG/VHT-SIG-A
    (and VHT-SIG-B) decode. Same shapes for every packet; one compilation.
  * `SisoDataDecoder` — specialized per (format, mcs, nSym): the DATA-field
    pipeline (FFT/equalize/track/demap/deinterleave/Viterbi/descramble) with
    static shapes so XLA fuses it into a few kernels.

Byte-level tail work (packing, FCS, A-MPDU walk) is host-side numpy
(parity: lib/decode_impl.cc:304-520).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mac import deaggregate_ht, deaggregate_vht
from ..specs import BW, CR, F, M, Mod, tables
from ..specs import interleaver as ilv
from ..specs.crc import fcs_ok
from ..specs.modulation import (ppdu_params_aggregate, ppdu_params_nonaggregate)
from ..specs.tables import crc8_bits
from ..ops import coding, demod, sync

# field offsets relative to the LTF data start (= STF start + 192 @20 MHz)
OFF_LSIG = 128
OFF_NLSIG = 208      # HT-SIG / VHT-SIG-A first symbol GI
OFF_NLSTF = 368
OFF_NLLTF = 448


def _bits_to_uint(bits: jnp.ndarray, lo: int, n: int) -> jnp.ndarray:
    w = (1 << jnp.arange(n, dtype=jnp.int32))
    return jnp.sum(bits[..., lo:lo + n].astype(jnp.int32) * w, axis=-1)


def _crc8_ok(bits48: jnp.ndarray) -> jnp.ndarray:
    """Batched SIG CRC-8 check: crc8(bits[0:34]) == bits[34:42].

    The bit-serial CRC is expressed as a GF(2) matrix product with a
    precomputed [34, 8] influence matrix (closed form, no scan).
    """
    mat, const = _crc8_matrix()
    calc = (bits48[..., :34].astype(jnp.int32) @ jnp.asarray(mat)
            + jnp.asarray(const)) % 2
    return jnp.all(calc == bits48[..., 34:42].astype(jnp.int32), axis=-1)


@lru_cache(maxsize=None)
def _crc8_matrix():
    """CRC-8 of 34 bits as affine map over GF(2): out = M^T b + c."""
    base = np.asarray(crc8_bits([0] * 34), dtype=np.int64)
    mat = np.zeros((34, 8), dtype=np.int64)
    for i in range(34):
        v = [0] * 34
        v[i] = 1
        mat[i] = (np.asarray(crc8_bits(v)) + base) % 2
    return mat, base


# ---------------------------------------------------------------------------
# SIG parsing (config-independent jit program)
# ---------------------------------------------------------------------------

SIGPARSE_WIN = 1040  # samples consumed from t0 (x q): preamble+SIGs+slack


@partial(jax.jit, static_argnames=("n_lag", "q"))
def sig_parse(x2: jnp.ndarray, t0: jnp.ndarray, n_lag: int = 176,
              q: int = 1):
    """Parse the preamble of packets at approximate STF starts t0.

    x2: [B, N, 2] float32 I/Q capture windows; t0: [B] int32.
    q: oversample factor vs 20 MHz (1/2/4 for a 20/40/80 MHz capture). The
    wide legacy-band fields are the 64-bin grid duplicated per 20 MHz
    subband (reference tools/phy80211.py:290-295); the duplicate data tones
    are equal-gain combined after per-subband ZF equalization, so SIG
    decode at 40/80 MHz gets a diversity gain the 20 MHz receiver lacks.
    Returns a dict of per-packet metadata (all [B]-shaped):
    ltf_start, cfo_rad, snr_db, lsig_ok, l_mcs, l_len, ht_ok, vht_ok,
    ht_sig_bits [B,48], vht_siga_bits [B,48].
    """
    from ..utils.riq import r2c
    bw = {1: BW.BW20, 2: BW.BW40, 4: BW.BW80}[q]
    x = r2c(x2)
    ltf_start, cfo, snr = sync.sync_front_iq(x2, t0, n_lag=n_lag, q=q)
    y = sync.apply_cfo_correction(x, cfo)
    nfft, gi, sh, sym = 64 * q, 16 * q, 8 * q, 80 * q

    ltf_t = demod.extract_symbol_windows(y, ltf_start - gi, 2, nfft=nfft,
                                         gi=gi, shift=sh, stride=nfft)
    ltf_f = demod.fft_syms(ltf_t)
    chan = demod.legacy_chan_est(ltf_f, bw)              # [B, 64q]

    d20 = np.asarray(tables.DATA_GRID[(BW.BW20, True)])
    p20 = np.asarray(tables.PILOT_GRID[(BW.BW20, True)])
    data_idx = np.concatenate([d20 + 64 * c for c in range(q)])
    pilot_idx = np.concatenate([p20 + 64 * c for c in range(q)])
    pil_l = np.tile(tables.PILOT_L, q)

    def sig_llr(start, n_sym, pidx0):
        g = demod.fft_syms(demod.extract_symbol_windows(
            y, start, n_sym, nfft=nfft, gi=gi, shift=sh))
        eq = demod.equalize(g, chan)
        pref = jnp.asarray(
            pil_l[None] * tables.PILOT_POLARITY[pidx0:pidx0 + n_sym, None])
        ph = demod.pilot_phase(eq, pref, pilot_idx)
        eq = eq / ph[..., None]
        tones = eq[..., jnp.asarray(data_idx)]           # [B, S, 48q]
        return tones.reshape(tones.shape[:-1] + (q, 48)).sum(axis=-2)

    perm = jnp.asarray(ilv.sig_rx_perm())
    lsig_eq = sig_llr(ltf_start + OFF_LSIG * q, 1, 0)[:, 0]  # [B, 48]
    lsig_llr = jnp.real(lsig_eq)[:, perm]
    lsig_bits = coding.viterbi_decode(lsig_llr, CR.CR12, 24)
    parity = jnp.sum(lsig_bits[:, :17], axis=-1) % 2
    lsig_ok = (parity == lsig_bits[:, 17]) & (lsig_bits[:, 3] == 1) \
        & (lsig_bits[:, 4] == 0)
    rate4 = lsig_bits[:, :4]
    rate_tab = jnp.asarray(tables.LEGACY_RATE_BITS)
    l_mcs = jnp.argmax(jnp.all(rate4[:, None, :] == rate_tab[None], axis=-1),
                       axis=-1)
    l_len = _bits_to_uint(lsig_bits, 5, 12)

    # the two post-L-SIG symbols carry HT-SIG (QBPSK) or VHT-SIG-A (BPSK+QBPSK)
    nl_eq = sig_llr(ltf_start + OFF_NLSIG * q, 2, 1)         # [B, 2, 48]
    im = jnp.imag(nl_eq)
    re = jnp.real(nl_eq)
    # constellation-rotation discriminator for symbol 1: HT-SIG is QBPSK
    # (energy on imag), VHT-SIG-A1 is BPSK (energy on real). Resolves the
    # 1-in-256 case where both SIG CRCs pass (the reference is ambiguous
    # here too, lib/demod_impl.cc:106-148).
    imag_dom = jnp.sum(im[:, 0] ** 2, axis=-1) > jnp.sum(re[:, 0] ** 2,
                                                         axis=-1)
    ht_llr = jnp.concatenate([im[:, 0][:, perm], im[:, 1][:, perm]], axis=-1)
    vht_llr = jnp.concatenate([re[:, 0][:, perm], im[:, 1][:, perm]], axis=-1)
    ht_bits = coding.viterbi_decode(ht_llr, CR.CR12, 48)
    vht_bits = coding.viterbi_decode(vht_llr, CR.CR12, 48)
    ht_ok = _crc8_ok(ht_bits)
    vht_ok = _crc8_ok(vht_bits)

    return dict(ltf_start=ltf_start, cfo=cfo, snr=snr, lsig_ok=lsig_ok,
                l_mcs=l_mcs, l_len=l_len, lsig_bits=lsig_bits,
                ht_ok=ht_ok, vht_ok=vht_ok, ht_bits=ht_bits,
                vht_bits=vht_bits, nl1_imag_dom=imag_dom)


def _pick_nl_format(meta, i) -> F:
    """HT vs VHT vs legacy-MCS0 from SIG CRCs + the QBPSK discriminator."""
    vht_ok = bool(meta["vht_ok"][i])
    ht_ok = bool(meta["ht_ok"][i])
    imag_dom = bool(meta["nl1_imag_dom"][i])
    if vht_ok and not imag_dom:
        return F.VHT
    if ht_ok and imag_dom:
        return F.HT
    if vht_ok:
        return F.VHT
    if ht_ok:
        return F.HT
    return F.L


def parse_ht_sig(bits: np.ndarray):
    mcs = int(np.sum(bits[0:7] << np.arange(7)))
    bw = BW.BW40 if bits[7] else BW.BW20
    length = int(np.sum(bits[8:24] << np.arange(16)))
    aggre = bool(bits[27])
    sgi = bool(bits[31])
    return mcs, bw, length, aggre, sgi


def parse_vht_siga(bits: np.ndarray):
    bw = BW(int(bits[0]) | (int(bits[1]) << 1))
    group_id = int(np.sum(bits[4:10] << np.arange(6)))
    su_nsts = int(np.sum(bits[10:13] << np.arange(3))) + 1
    partial_aid = int(np.sum(bits[13:22] << np.arange(9)))
    sgi = bool(bits[24])
    mcs = int(np.sum(bits[28:32] << np.arange(4)))
    return bw, group_id, su_nsts, partial_aid, sgi, mcs


# ---------------------------------------------------------------------------
# DATA-field decoding (config-specialized)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PacketResult:
    fmt: F
    mcs: int
    psdu: bytes
    fcs_ok: bool
    mpdus: List[bytes]
    cfo_hz: float
    snr_db: float
    evm_snr_db: float = 0.0   # per-stream EVM SNR (reference sssnr analog)


class SisoDataDecoder:
    """Batched DATA-field decoder for one static (Mod, nSym-bucket) config.

    n_sym is the compiled symbol capacity. Packets with fewer true symbols
    pass their count through `n_valid` (a traced array): LLRs past the true
    extent are zeroed (path-neutral in the Viterbi — the trailing survivor
    diffusion still tracebacks to the max-likelihood state) and excluded
    from the EVM. One compilation therefore serves every packet length in
    the bucket — the fix for the per-length compile storm (a first compile
    costs 30-120 s on this relay)."""

    def __init__(self, mod: Mod, n_sym: int, psdu_len: int = 0):
        self.mod = mod
        self.n_sym = n_sym
        self.psdu_len = psdu_len
        self.n_bits = n_sym * mod.nDBPS
        self.q = tables.NFFT[mod.bw] // 64
        self._fn = jax.jit(self._decode)

    def data_offset(self) -> int:
        """DATA field GI offset relative to the LTF data start (in samples
        at the capture rate: 20 MHz-unit offsets x q)."""
        if self.mod.fmt == F.L:
            off = OFF_LSIG + 80
        elif self.mod.fmt == F.HT:
            off = OFF_NLLTF + 80 * self.mod.nLTF
        else:
            off = OFF_NLLTF + 80 * self.mod.nLTF + 80   # VHT: + SIG-B
        return off * self.q

    def _decode(self, x2: jnp.ndarray, ltf_start: jnp.ndarray,
                cfo: jnp.ndarray, n_valid: jnp.ndarray = None):
        """x2: [B, N, 2] float32 raw windows; ltf_start, cfo: [B];
        n_valid: optional [B] int32 true symbol counts (<= self.n_sym)."""
        from ..utils.riq import r2c
        mod = self.mod
        q = self.q
        nfft, gi, sh = 64 * q, 16 * q, 8 * q
        y = sync.apply_cfo_correction(r2c(x2), cfo)
        if mod.fmt == F.L:
            ltf_t = demod.extract_symbol_windows(y, ltf_start - 16, 2,
                                                 stride=64)
            chan = demod.legacy_chan_est(demod.fft_syms(ltf_t))
            pidx0 = 1
        else:
            # channel update from the first non-legacy LTF
            ltf_t = demod.extract_symbol_windows(
                y, ltf_start + OFF_NLLTF * q, 1, nfft=nfft, gi=gi, shift=sh)
            chan = demod.nonlegacy_chan_est_siso(
                demod.fft_syms(ltf_t)[:, 0], mod.bw)
            pidx0 = 3 if mod.fmt == F.HT else 4
        g = demod.fft_syms(demod.extract_symbol_windows(
            y, ltf_start + self.data_offset(), self.n_sym,
            nfft=nfft, gi=gi, shift=sh))
        llrs, evm = demod.demod_data_siso(g, chan, mod, self.n_sym, pidx0,
                                          with_snr=True,
                                          n_valid_sym=n_valid)
        bits = coding.viterbi_decode(llrs, mod.cr, self.n_bits)
        scr = coding.descramble(bits)
        return scr, evm

    def decode(self, x2: jnp.ndarray, ltf_start: jnp.ndarray,
               cfo: jnp.ndarray, n_valid: jnp.ndarray = None):
        """Returns (descrambled bits [B, n_bits], evm_snr_db [B])."""
        bits, evm = self._fn(x2, ltf_start, cfo, n_valid)
        return np.asarray(bits), np.asarray(evm)


N_SYM_BUCKET = 16   # decoder symbol-capacity granularity: a mixed-length
                    # capture compiles one program per (Mod, bucket), not
                    # per exact n_sym (VERDICT.md round-1 Weak #3)


def _bucket(n_sym: int) -> int:
    return -(-n_sym // N_SYM_BUCKET) * N_SYM_BUCKET


@lru_cache(maxsize=64)
def get_data_decoder(mod: Mod, n_sym_bucket: int) -> SisoDataDecoder:
    return SisoDataDecoder(mod, n_sym_bucket)


def assemble_packet(fmt: F, mod: Mod, psdu_len: int, scr_bits: np.ndarray,
                    ampdu: bool, cfo_hz: float = 0.0, snr_db: float = 0.0,
                    evm_snr_db: float = 0.0) -> PacketResult:
    """Service-strip + byte-pack + FCS / A-MPDU deaggregation (host side)."""
    psdu_bits = scr_bits[16:16 + psdu_len * 8].astype(np.uint8)
    psdu = np.packbits(psdu_bits, bitorder="little").tobytes()
    if fmt == F.VHT:
        mpdus = [s.mpdu for s in deaggregate_vht(psdu) if s.fcs_ok]
        ok = len(mpdus) > 0
    elif ampdu:
        mpdus = [s.mpdu for s in deaggregate_ht(psdu) if s.fcs_ok]
        ok = len(mpdus) > 0
    else:
        ok = fcs_ok(psdu)
        mpdus = [psdu] if ok else []
    return PacketResult(fmt=fmt, mcs=mod.mcs, psdu=psdu, fcs_ok=ok,
                        mpdus=mpdus, cfo_hz=cfo_hz, snr_db=snr_db,
                        evm_snr_db=evm_snr_db)


# ---------------------------------------------------------------------------
# capture-level receiver (auto-detecting)
# ---------------------------------------------------------------------------


class SisoReceiver:
    """Decode packets from capture windows with automatic format detection.

    Workflow parity with examples/rx.grc: trigger (host) -> sig_parse (jit,
    one compilation) -> per-config SisoDataDecoder (jit cache).
    """

    def __init__(self, sample_rate_hz: float = 20e6, stats=None):
        self.fs = sample_rate_hz
        self.q = int(round(sample_rate_hz / 20e6))
        if self.q not in (1, 2, 4):
            raise ValueError("sample rate must be 20/40/80 MHz")
        self.bw = {1: BW.BW20, 2: BW.BW40, 4: BW.BW80}[self.q]
        from ..utils.metrics import DecodeStats
        self.stats = stats if stats is not None else DecodeStats()

    def decode_capture(self, capture: np.ndarray,
                       max_window: Optional[int] = None) -> List[PacketResult]:
        capture = np.asarray(capture, dtype=np.complex64)
        t0s = sync.find_triggers_np(capture, q=self.q)
        results: List[PacketResult] = []
        if len(t0s) == 0:
            return results
        del max_window  # packet windows are sized from the decoded length
        # pass 1: fixed small preamble windows -> batched SIG parse. The
        # non-legacy STF mid-packet also correlates at lag 16q and can
        # re-fire the trigger (the reference re-arms the same way,
        # lib/trigger_impl.cc:92-109); those spurious windows fail L-SIG
        # and are dropped below.
        wlen = min((SIGPARSE_WIN + 320) * self.q, len(capture))
        xs = np.zeros((len(t0s), wlen, 2), dtype=np.float32)
        for i, t in enumerate(t0s):
            seg = capture[t:t + wlen]
            xs[i, :len(seg), 0] = np.real(seg)
            xs[i, :len(seg), 1] = np.imag(seg)
        t0 = np.zeros(len(t0s), dtype=np.int32)
        meta = {k: np.asarray(v) for k, v in
                sig_parse(jnp.asarray(xs), jnp.asarray(t0),
                          q=self.q).items()}
        self.stats.n_trigger += len(t0s)
        self.stats.n_sig_ok += int(np.sum(meta["lsig_ok"]))
        # pass 2: per-packet DATA windows cut to the exact decoded extent
        for i in range(len(t0s)):
            r = self._decode_one(capture, int(t0s[i]), meta, i)
            if r is not None:
                self.stats.record(r.fmt.name, r.mcs, r.fcs_ok)
                results.append(r)
        return results

    def _data_window(self, capture: np.ndarray, t_abs: int,
                     need: int) -> np.ndarray:
        w = np.zeros((1, need, 2), dtype=np.float32)
        seg = capture[t_abs:t_abs + need]
        w[0, :len(seg), 0] = np.real(seg)
        w[0, :len(seg), 1] = np.imag(seg)
        return w

    def _run_data(self, capture, t_abs, meta, i, mod, n_sym, psdu_len,
                  ampdu, cfo_hz, snr, ltf_start) -> PacketResult:
        """Cut a bucket-sized window and decode n_sym true symbols through
        the (Mod, bucket)-keyed jit program."""
        nb = _bucket(n_sym)
        need = ltf_start + (OFF_NLLTF + 80 * mod.nLTF + 160
                            + nb * 80) * self.q
        dec = get_data_decoder(mod, nb)
        bits, evm = dec.decode(
            jnp.asarray(self._data_window(capture, t_abs, need)),
            jnp.asarray([ltf_start], dtype=np.int32),
            jnp.asarray([meta["cfo"][i]], dtype=np.float32),
            jnp.asarray([n_sym], dtype=np.int32))
        return assemble_packet(mod.fmt, mod, psdu_len, bits[0], ampdu,
                               cfo_hz, snr, float(evm[0]))

    def _decode_one(self, capture: np.ndarray, t_abs: int, meta,
                    i) -> Optional[PacketResult]:
        if not bool(meta["lsig_ok"][i]):
            return None
        # sync gate: the reference only syncs when the LTF autocorrelation
        # peak exceeds 0.5 (lib/sync_impl.cc:99); with snr = 10log10(ac/(1-ac))
        # that is exactly snr > 0 dB. Drops mid-packet re-triggers whose
        # junk L-SIG passes parity by chance (they'd otherwise each compile
        # a junk-length DATA program).
        if float(meta["snr"][i]) <= 0.0:
            return None
        # length-consistency guards (parity: lib/demod_impl.cc:159,186 and
        # the PSDU/trellis caps in lib/decode_impl.h:35-36)
        def extent(mod, n_sym, ltf_start):
            return ltf_start + (OFF_NLLTF + 80 * mod.nLTF + 160
                                + n_sym * 80) * self.q

        def fits(mod, n_sym, ltf_start):
            return (0 < n_sym and n_sym * mod.nDBPS <= 33000
                    and t_abs + extent(mod, n_sym, ltf_start)
                    <= len(capture))
        cfo_hz = float(meta["cfo"][i]) * self.fs / (2 * np.pi) * -1.0
        snr = float(meta["snr"][i])
        ltf_start = int(meta["ltf_start"][i])
        l_mcs = int(meta["l_mcs"][i])
        l_len = int(meta["l_len"][i])
        fmt = F.L
        if l_mcs == 0:
            fmt = _pick_nl_format(meta, i)
        if fmt == F.L:
            if self.q != 1:
                return None    # legacy payloads exist only at 20 MHz
            if not (14 <= l_len <= 4095):
                return None
            mod = Mod(F.L, l_mcs)
            pp = ppdu_params_nonaggregate(mod, l_len)
            if not fits(mod, pp.n_sym, ltf_start):
                return None
            return self._run_data(capture, t_abs, meta, i, mod, pp.n_sym,
                                  l_len, False, cfo_hz, snr, ltf_start)
        if fmt == F.HT:
            mcs, bw, length, aggre, sgi = parse_ht_sig(meta["ht_bits"][i])
            if bw != self.bw or mcs > 15 or sgi:
                return None    # packet bw must match the capture rate;
                               # SGI out of envelope (as in the reference)
            nsts = mcs // 8 + 1
            if nsts != 1:
                return None    # SISO receiver; 2x2 handled by MimoReceiver
            if not (1 <= length <= 4095):
                return None
            mod = Mod(F.HT, mcs, bw, nsts, sgi)
            pp = ppdu_params_nonaggregate(mod, length)
            if not fits(mod, pp.n_sym, ltf_start):
                return None
            return self._run_data(capture, t_abs, meta, i, mod, pp.n_sym,
                                  length, aggre, cfo_hz, snr, ltf_start)
        # VHT
        bw, gid, nsts, paid, sgi, mcs = parse_vht_siga(meta["vht_bits"][i])
        if bw != self.bw or sgi or nsts != 1:
            return None
        mod = Mod(F.VHT, mcs, bw, nsts, sgi)
        # total symbol budget from the legacy length
        n_sym_l = int(np.ceil((l_len * 8 + 16 + 6) / 24))
        n_sym = n_sym_l - 2 - 1 - mod.nLTF - 1
        if n_sym <= 0:
            return None        # NDP: channel report path (mu/feedback.py)
        psdu_len = (n_sym * mod.nDBPS - 16 - 6 * mod.nES) // 8
        if not fits(mod, n_sym, ltf_start) or psdu_len > 4095:
            return None
        return self._run_data(capture, t_abs, meta, i, mod, n_sym,
                              psdu_len, True, cfo_hz, snr, ltf_start)
