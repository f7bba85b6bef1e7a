"""n_sym bucketing: one compiled program per (Mod, bucket), not per length.

Round-1 VERDICT Weak #3: the auto-detect receiver compiled one XLA program
per exact (Mod, n_sym, psdu_len) — a compile storm on real captures with
mixed packet lengths (30-120 s per first compile on the TPU relay). Now
decoders are keyed by (Mod, 16-symbol bucket) and the true symbol count is
a traced argument; LLRs past the true extent are zeroed (path-neutral).
"""
import numpy as np

from ieee80211_tpu.mac import MacConfig, aggregate_vht, build_udp_mpdu
from ieee80211_tpu.rx import SisoReceiver
from ieee80211_tpu.rx.receiver import (N_SYM_BUCKET, _bucket,
                                       get_data_decoder)
from ieee80211_tpu.specs import F, Mod
from ieee80211_tpu.tx import finalize, gen_ampdu, gen_mpdu

MAC_CFG_QOS = MacConfig(subtype=8, addr1="f4:69:d5:80:0f:a0",
                        addr2="00:c0:ca:b1:5b:e1",
                        addr3="f4:69:d5:80:0f:a0", seq=2704)
MAC_CFG = MacConfig(addr1="f4:69:d5:80:0f:a0", addr2="00:c0:ca:b1:5b:e1",
                    addr3="f4:69:d5:80:0f:a0", seq=2704)


def test_bucket_helper():
    assert _bucket(1) == N_SYM_BUCKET
    assert _bucket(N_SYM_BUCKET) == N_SYM_BUCKET
    assert _bucket(N_SYM_BUCKET + 1) == 2 * N_SYM_BUCKET


def test_twenty_lengths_bounded_compiles():
    """A capture with 20 distinct packet lengths decodes bit-exactly with
    <= 6 compiled DATA programs (VERDICT round-1 'done' criterion)."""
    rng = np.random.default_rng(5)
    get_data_decoder.cache_clear()
    parts, mpdus = [], []
    mod = Mod(F.VHT, 7)
    for i, plen in enumerate(range(40, 40 + 20 * 42, 42)):  # 20 lengths
        payload = bytes(rng.integers(0, 256, plen, dtype=np.uint8))
        mpdu = build_udp_mpdu(payload, MAC_CFG_QOS)
        mpdus.append(mpdu)
        wave = gen_ampdu(aggregate_vht([mpdu]), mod).waveform
        parts.append(finalize(wave, 0.2, cfo_hz=5000.0 * (i % 3),
                              gap=True, gap_len=900)[0])
    cap = np.concatenate(parts)
    res = SisoReceiver().decode_capture(cap)
    assert len(res) == 20
    for r, mpdu in zip(res, mpdus):
        assert r.fcs_ok and r.mpdus[0] == mpdu
    n_programs = get_data_decoder.cache_info().currsize
    assert n_programs <= 6, f"compile storm: {n_programs} DATA programs"


def test_mixed_formats_share_buckets():
    """L/HT packets of different lengths in one bucket reuse one program
    per format; decoded MPDUs stay bit-exact incl. EVM sanity."""
    rng = np.random.default_rng(6)
    get_data_decoder.cache_clear()
    parts, mpdus = [], []
    for fmt, plen in [(F.L, 60), (F.L, 140), (F.HT, 60), (F.HT, 180)]:
        payload = bytes(rng.integers(0, 256, plen, dtype=np.uint8))
        mpdu = build_udp_mpdu(payload, MAC_CFG)
        mpdus.append(mpdu)
        wave = gen_mpdu(mpdu, Mod(fmt, 5)).waveform
        parts.append(finalize(wave, 0.2, cfo_hz=9000.0, gap=True,
                              gap_len=900)[0])
    cap = np.concatenate(parts)
    res = SisoReceiver().decode_capture(cap)
    assert len(res) == 4
    for r, mpdu in zip(res, mpdus):
        assert r.fcs_ok and r.mpdus[0] == mpdu
        assert r.evm_snr_db > 25.0        # masked EVM: junk syms excluded
    # L5 lengths 60/140 share one bucket or two; HT5 same — but never one
    # program per packet
    assert get_data_decoder.cache_info().currsize <= 4


def test_plan_batch_matches_plan_one():
    """The vectorized planner (_plan_batch) must make the same decisions,
    packet for packet, as the scalar reference (_plan_one) — incl. NDPs,
    junk triggers (noise-only windows) and out-of-envelope configs."""
    rng = np.random.default_rng(7)
    parts = []
    for fmt, mcs, plen in [(F.L, 3, 80), (F.HT, 6, 200), (F.VHT, 7, 300),
                           (F.VHT, 2, 55)]:
        payload = bytes(rng.integers(0, 256, plen, dtype=np.uint8))
        if fmt == F.VHT:
            wave = gen_ampdu(aggregate_vht([build_udp_mpdu(
                payload, MAC_CFG_QOS)]), Mod(fmt, mcs)).waveform
        else:
            wave = gen_mpdu(build_udp_mpdu(payload, MAC_CFG),
                            Mod(fmt, mcs)).waveform
        parts.append(finalize(wave, 0.2, cfo_hz=7000.0, gap=True,
                              gap_len=700)[0])
    ndp = gen_ampdu(b"", Mod(F.VHT, 0, nSTS=2))
    parts.append(finalize(ndp.waveform, 0.2, gap=True, gap_len=700)[0])
    cap = np.concatenate(parts)
    cap = cap + (rng.standard_normal(cap.shape)
                 + 1j * rng.standard_normal(cap.shape)).astype(
                     np.complex64) * 1e-3
    rx = SisoReceiver()
    from ieee80211_tpu.ops import sync
    t0s = np.asarray(sync.find_triggers_np(
        np.ascontiguousarray(cap, np.complex64), q=1), np.int64)
    assert len(t0s) >= 5
    cap_dev, scale, npad = rx._upload(np.asarray(cap, np.complex64))
    meta = rx._parse_sigs(cap_dev, scale, npad, t0s)
    plans_b, ndps_b = rx._plan_batch(len(cap), meta, len(t0s))
    plans_s, ndps_s = [], []
    for i in range(len(t0s)):
        p = rx._plan_one(len(cap), meta, i)
        if p is None:
            continue
        (ndps_s if p.ndp else plans_s).append((i, p))
    assert [i for i, _ in plans_b] == [i for i, _ in plans_s]
    for (_, pb), (_, ps) in zip(plans_b, plans_s):
        assert pb == ps, (pb, ps)
    assert len(ndps_b) == len(ndps_s)
    for pb, (_, ps) in zip(ndps_b, ndps_s):
        assert pb == ps


def test_decode_captures_stream_matches_single():
    """The pipelined stream entry returns exactly the per-capture results
    of decode_capture (bit-exact PSDUs, same order)."""
    rng = np.random.default_rng(8)
    caps = []
    for k in range(3):
        parts = []
        for plen in (70, 220, 400):
            mpdu = build_udp_mpdu(
                bytes(rng.integers(0, 256, plen, dtype=np.uint8)),
                MAC_CFG_QOS)
            wave = gen_ampdu(aggregate_vht([mpdu]), Mod(F.VHT, 5)).waveform
            parts.append(finalize(wave, 0.2, cfo_hz=4000.0 * k, gap=True,
                                  gap_len=800)[0])
        caps.append(np.concatenate(parts))
    rx = SisoReceiver()
    stream = rx.decode_captures(caps)
    assert len(stream) == 3
    for cap, res in zip(caps, stream):
        single = SisoReceiver().decode_capture(cap)
        assert [r.psdu for r in res] == [r.psdu for r in single]
        assert all(r.fcs_ok for r in res) and len(res) == 3
    # the DEVICE-trigger stream (in-graph trigger scan, 2-deep pipeline)
    # must produce the same packets
    rxd = SisoReceiver(trigger="device")
    stream_d = rxd.decode_captures(caps)
    assert len(stream_d) == 3
    for res, res_d in zip(stream, stream_d):
        assert [r.psdu for r in res_d] == [r.psdu for r in res]


def test_device_trigger_scan_matches_host():
    """ops/sync.trigger_scan_capture (in-graph) finds the same trigger
    set as the host/native scan on a mixed multi-packet capture."""
    import jax.numpy as jnp
    from ieee80211_tpu.ops import sync
    rng = np.random.default_rng(9)
    parts = []
    for k in range(6):
        mpdu = build_udp_mpdu(
            bytes(rng.integers(0, 256, 120 + 60 * k, dtype=np.uint8)),
            MAC_CFG_QOS)
        wave = gen_ampdu(aggregate_vht([mpdu]), Mod(F.VHT, 4)).waveform
        parts.append(finalize(wave, 0.2, cfo_hz=3e3 * (k - 2), gap=True,
                              gap_len=700 + 31 * k)[0])
    cap = np.ascontiguousarray(np.concatenate(parts), np.complex64)
    from ieee80211_tpu.rx.receiver import MIN_TRIGGER_GAP
    host = np.asarray(sync.find_triggers_np(
        cap, q=1, min_gap=MIN_TRIGGER_GAP), np.int64)
    rx = SisoReceiver(trigger="device")
    trig, ntrig, cap_dev, scale, npad = rx._ingest_device(cap)
    n_t = int(np.asarray(ntrig))
    dev = np.asarray(trig)[:n_t].astype(np.int64)
    # same detection set (positions may differ by a sample or two at the
    # plateau edge; sync absorbs that)
    assert len(dev) == len(host), (dev, host)
    assert np.all(np.abs(dev - host) <= 4), (dev, host)
