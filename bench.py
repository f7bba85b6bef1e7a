#!/usr/bin/env python
"""Benchmark: full RX decode throughput (MCS7, 20 MHz) on one TPU chip.

Headline metric (BASELINE.md): PHY samples/sec/chip through the complete
receive chain — sync, CFO, channel estimation, L-SIG decode, per-symbol
demod and soft Viterbi — on a batch of VHT MCS7 packets (500 B payload, the
reference perf_siso.py operating point). vs_baseline is relative to the
reference's implied real-time operating point of 20 Msps sustained
(USRP B200 @ 20 MHz, examples/rx.grc).

Prints ONE JSON line.
"""
import json
import sys
import time

import numpy as np


def build_batch(batch: int):
    from ieee80211_tpu.mac import (MacConfig, aggregate_vht, build_udp_mpdu)
    from ieee80211_tpu.models import RxPipeline
    from ieee80211_tpu.specs import F, Mod
    from ieee80211_tpu.specs.modulation import ppdu_params_aggregate
    from ieee80211_tpu.tx import finalize, gen_ampdu

    cfg = MacConfig(subtype=8, addr1="f4:69:d5:80:0f:a0",
                    addr2="00:c0:ca:b1:5b:e1", addr3="f4:69:d5:80:0f:a0",
                    seq=2704)
    payload = bytes(np.random.default_rng(0).integers(0, 256, 500,
                                                      dtype=np.uint8))
    mpdu = build_udp_mpdu(payload, cfg)
    ampdu = aggregate_vht([mpdu])
    mod = Mod(F.VHT, 7)
    pp = ppdu_params_aggregate(mod, len(ampdu))
    wave = finalize(gen_ampdu(ampdu, mod).waveform, multiplier=0.2,
                    cfo_hz=15000.0, gap=True, gap_len=64)[0]
    from ieee80211_tpu.utils import c2r
    pipe = RxPipeline(mod, pp.n_sym, pp.psdu_len)
    w = pipe.window_len()
    seg = wave[64 - 8:]
    x = np.zeros((batch, w), dtype=np.complex64)
    x[:, :min(w, len(seg))] = seg[:min(w, len(seg))]
    t0 = np.zeros(batch, dtype=np.int32)
    return pipe, c2r(x), t0, mpdu


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    pipe, x, t0, mpdu = build_batch(batch)
    xd = jnp.asarray(x)
    td = jnp.asarray(t0)

    out = pipe.step(xd, td)
    jax.block_until_ready(out)
    # correctness gate (outside timing): every packet decodes
    bits = np.asarray(out["bits"][0]).astype(np.uint8)
    psdu = np.packbits(bits[16:16 + pipe.psdu_len * 8],
                       bitorder="little").tobytes()
    from ieee80211_tpu.mac import deaggregate_vht
    subs = deaggregate_vht(psdu)
    assert subs and subs[0].fcs_ok and subs[0].mpdu == mpdu, "decode invalid"

    # Timing methodology: this environment's TPU relay can acknowledge
    # dispatches before execution completes, and its dispatch round-trip
    # jitters by several ms. So: (a) time a scalar-returning program whose
    # fetch forces the full computation, (b) run the step K times inside
    # ONE program with a forced data dependency (an invisible 1e-30 input
    # perturbation defeats CSE/hoisting), so the round-trip error is
    # divided by K, and (c) subtract the measured round-trip.
    K = 8
    step = pipe.step

    def k_loop(fn, k):
        @jax.jit
        def run(x, t):
            def body(i, c):
                s, xx = c
                s2 = fn(xx, t)
                return (s + s2, xx + s2 * jnp.float32(1e-30))
            s, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
            return s
        return run

    step_k = k_loop(lambda x, t: jnp.sum(
        step(x, t)["bits"][:, :8]).astype(jnp.float32), K)

    @jax.jit
    def trivial(x):
        return jnp.sum(x[:, 0, 0]) * 0 + 1.0

    np.asarray(trivial(xd))
    rts = []
    for _ in range(8):
        t = time.perf_counter()
        np.asarray(trivial(xd))
        rts.append(time.perf_counter() - t)
    rt = min(rts)

    np.asarray(step_k(xd, td))   # compile + warm
    dts = []
    for _ in range(iters):
        t = time.perf_counter()
        np.asarray(step_k(xd, td))
        dts.append(time.perf_counter() - t)
    dt = max((np.median(dts) - rt) / K, 1e-9)

    samples = batch * x.shape[1]
    sps = samples / dt
    iters = len(dts)

    # secondary metric: batched TX generation rate (BASELINE config 1)
    tx_sps = 0.0
    try:
        from ieee80211_tpu.mac import MacConfig, build_udp_mpdu
        from ieee80211_tpu.specs import F, Mod
        from ieee80211_tpu.specs.modulation import ppdu_params_nonaggregate
        from ieee80211_tpu.tx.jax_tx import TxPipeline
        cfg = MacConfig(addr1="f4:69:d5:80:0f:a0",
                        addr2="00:c0:ca:b1:5b:e1",
                        addr3="f4:69:d5:80:0f:a0", seq=2704)
        mpdu = build_udp_mpdu(b"123456789012345678901234567890", cfg)
        mod = Mod(F.L, 0)
        txp = TxPipeline(mod, ppdu_params_nonaggregate(mod, len(mpdu)))
        pin = jnp.asarray(np.tile(np.frombuffer(mpdu, np.uint8),
                                  (batch, 1)))

        @jax.jit
        def tx_k(p):
            def body(i, c):
                s, pp_ = c
                s2 = jnp.sum(txp._tx(pp_)[:, 0, 0, :])
                # runtime-zero XOR defeats loop hoisting on int inputs
                return (s + s2, pp_ ^ (s2 * 1e-30).astype(jnp.uint8))
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), p))
            return s

        np.asarray(tx_k(pin))
        tts = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(tx_k(pin))
            tts.append(time.perf_counter() - t)
        n_tx_samp = batch * (txp.n_samp)
        tx_sps = n_tx_samp / max((np.median(tts) - rt) / K, 1e-9)
    except Exception:
        pass

    # secondary metric: 80 MHz VHT MCS9 decode rate (beyond the reference
    # envelope — its RX is 20 MHz-only)
    wb_sps = 0.0
    try:
        from ieee80211_tpu.mac import aggregate_vht as _agg
        from ieee80211_tpu.mac import MacConfig as _MC
        from ieee80211_tpu.mac import build_udp_mpdu as _bum
        from ieee80211_tpu.models import RxPipeline as _RxP
        from ieee80211_tpu.specs import BW as _BW
        from ieee80211_tpu.specs import F as _F
        from ieee80211_tpu.specs import Mod as _Mod
        from ieee80211_tpu.specs.modulation import (
            ppdu_params_aggregate as _ppa)
        from ieee80211_tpu.tx import finalize as _fin
        from ieee80211_tpu.tx import gen_ampdu as _ga
        from ieee80211_tpu.utils import c2r as _c2r
        wb_batch = max(batch // 4, 1)
        _cfg = _MC(subtype=8, addr1="f4:69:d5:80:0f:a0",
                   addr2="00:c0:ca:b1:5b:e1", addr3="f4:69:d5:80:0f:a0",
                   seq=2704)
        _pl = bytes(np.random.default_rng(1).integers(0, 256, 1800,
                                                      dtype=np.uint8))
        _am = _agg([_bum(_pl, _cfg)])
        _mod = _Mod(_F.VHT, 9, _BW.BW80, 1)
        _pp = _ppa(_mod, len(_am))
        _wv = _fin(_ga(_am, _mod).waveform, multiplier=0.2,
                   cfo_hz=60000.0, gap=True, gap_len=256)[0]
        _pipe = _RxP(_mod, _pp.n_sym, _pp.psdu_len)
        _w = _pipe.window_len()
        _seg = _wv[(64 - 8) * 4:]
        _x = np.zeros((wb_batch, _w), dtype=np.complex64)
        _x[:, :min(_w, len(_seg))] = _seg[:min(_w, len(_seg))]
        _xd = jnp.asarray(_c2r(_x))
        _td = jnp.zeros(wb_batch, jnp.int32)

        wb_k = k_loop(lambda x, t: jnp.sum(
            _pipe.step(x, t)["bits"][:, :8]).astype(jnp.float32), K)
        np.asarray(wb_k(_xd, _td))
        wts = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(wb_k(_xd, _td))
            wts.append(time.perf_counter() - t)
        wb_sps = wb_batch * _w / max((np.median(wts) - rt) / K, 1e-9)
    except Exception:
        pass

    baseline_sps = 20e6   # reference real-time operating point: 20 Msps
    print(json.dumps({
        "metric": "rx_decode_samples_per_sec_per_chip_vht_mcs7_20mhz",
        "value": round(sps),
        "unit": "samples/s",
        "vs_baseline": round(sps / baseline_sps, 3),
        "extra": {
            "batch": batch,
            "window": int(x.shape[1]),
            "iters": iters,
            "packets_per_sec": round(batch / dt),
            "tx_gen_samples_per_sec_l_mcs0": round(tx_sps),
            "rx_decode_sps_vht80_mcs9": round(wb_sps),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
