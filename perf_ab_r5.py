#!/usr/bin/env python
"""Round-5 perf A/Bs on TPU (VERDICT r4 items 1, 2, 4).

  1. int8 LLR DMA into the Pallas Viterbi vs f32 — end-to-end headline
     pipeline, alternating in-process (the only comparable protocol on
     this drifting relay; CLAUDE.md).
  2. Dual-chain stream detector: auto (ZF + exact-ML retry) vs ml vs zf.
  3. Relay-floor bracket for the SISO stream: upload-only and
     upload+SIG-dispatch-only rates on the same capture set — bounds what
     the host pipeline can ever deliver, settling "is it the relay or us".

Usage: python perf_ab_r5.py [int8|mimo|floor|all]
"""
import sys
import time

import numpy as np


def _rt(jnp, jax, xd):
    @jax.jit
    def trivial(x):
        return jnp.sum(x[:, 0, 0]) * 0 + 1.0
    np.asarray(trivial(xd))
    rts = []
    for _ in range(8):
        t = time.perf_counter()
        np.asarray(trivial(xd))
        rts.append(time.perf_counter() - t)
    return min(rts)


def ab_int8(reps=3):
    import jax
    import jax.numpy as jnp
    from bench import build_batch
    from ieee80211_tpu.ops.pallas import viterbi as V

    batch = 2048
    pipe, x, t0, mpdu = build_batch(batch)
    xd = jnp.asarray(x)
    td = jnp.asarray(t0)
    rt = _rt(jnp, jax, xd)
    K = 8

    from ieee80211_tpu.models.pipeline import make_rx_step

    def make_step():
        # a FRESH unjitted step + fresh outer jit each time, so the trace
        # re-reads V.DTYPE (pipe.step's own jit would cache the old trace)
        raw = make_rx_step(pipe.mod, pipe.n_sym)

        @jax.jit
        def run(x, t):
            def body(i, c):
                s, xx = c
                s2 = jnp.sum(raw(xx, t)["bits"][:, :8]).astype(jnp.float32)
                return (s + s2, xx + s2 * jnp.float32(1e-30))
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x))
            return s
        return run

    def measure(dt):
        V.DTYPE = dt
        run = make_step()
        np.asarray(run(xd, td))
        dts = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(run(xd, td))
            dts.append(time.perf_counter() - t)
        return batch * x.shape[1] / max((np.median(dts) - rt) / K, 1e-9)

    # correctness gate: int8 decodes the exact packet
    V.DTYPE = jnp.int8
    out = pipe.step(xd[:8], td[:8])
    bits = np.asarray(out["bits"][0]).astype(np.uint8)
    psdu = np.packbits(bits[16:16 + pipe.psdu_len * 8],
                       bitorder="little").tobytes()
    from ieee80211_tpu.mac import deaggregate_vht
    subs = deaggregate_vht(psdu)
    assert subs and subs[0].fcs_ok and subs[0].mpdu == mpdu, \
        "int8 decode invalid"
    V.DTYPE = jnp.float32

    for r in range(reps):
        a = measure(jnp.float32)
        b = measure(jnp.int8)
        print(f"[int8 A/B rep{r}] f32 {a/1e6:.1f} Msps | int8 {b/1e6:.1f} "
              f"Msps", flush=True)
    V.DTYPE = jnp.float32


def _mimo_caps():
    from ieee80211_tpu.mac import (MacConfig, aggregate_vht, build_udp_mpdu)
    from ieee80211_tpu.specs import BW, F, Mod
    from ieee80211_tpu.tx import finalize, gen_ampdu
    cfg = MacConfig(subtype=8, addr1="f4:69:d5:80:0f:a0",
                    addr2="00:c0:ca:b1:5b:e1", addr3="f4:69:d5:80:0f:a0",
                    seq=2704)
    h1 = np.array([0.9 - 0.3j, 0.5 + 0.8j])
    h22 = np.array([[1.1 + 0.2j, 0.3 - 0.5j], [-0.4 + 0.6j, 0.9 + 0.1j]])
    rng5 = np.random.default_rng(15)
    parts2 = []
    n_pkts = 0
    for i in range(12):
        pl = bytes(rng5.integers(0, 256, int(rng5.integers(100, 700)),
                                 dtype=np.uint8))
        mp = build_udp_mpdu(pl, cfg)
        if i % 2:
            wv = gen_ampdu(aggregate_vht([mp]),
                           Mod(F.VHT, 4, BW.BW20, 2)).waveform
            wv = finalize(wv, multiplier=0.2, cfo_hz=float(
                rng5.uniform(-4e4, 4e4)), gap=False)
            w2 = h22 @ wv
        else:
            wv = finalize(gen_ampdu(aggregate_vht([mp]),
                                    Mod(F.VHT, 7)).waveform,
                          multiplier=0.2, cfo_hz=float(
                              rng5.uniform(-4e4, 4e4)), gap=False)[0]
            w2 = np.stack([h1[0] * wv, h1[1] * wv])
        parts2.append(np.zeros((2, 800), np.complex64))
        parts2.append(w2.astype(np.complex64))
        n_pkts += 1
    seg2 = np.concatenate(parts2, axis=1)
    big2 = np.concatenate([seg2] * 40, axis=1)
    caps2 = [np.concatenate(
        [np.zeros((2, 64 + 32 * k), np.complex64), big2], axis=1)
        for k in range(3)]
    return caps2, n_pkts * 40


def ab_mimo(reps=3):
    from ieee80211_tpu.rx.mimo import MimoReceiver
    caps2, want = _mimo_caps()
    total = sum(c.shape[1] for c in caps2)
    rxs = {d: MimoReceiver(detector=d) for d in ("auto", "zf", "ml")}
    for d, rx in rxs.items():            # warm + correctness
        stream = rx.decode_captures(caps2)
        for res_k in stream:
            ok = sum(1 for r in res_k if r.fcs_ok)
            assert ok == want, f"{d}: {ok}/{want}"
    for r in range(reps):
        line = []
        for d, rx in rxs.items():
            t = time.perf_counter()
            rx.decode_captures(caps2)
            line.append(f"{d} {total / (time.perf_counter() - t) / 1e6:.1f}")
        print(f"[mimo stream rep{r}] " + " | ".join(line) + " Msps",
              flush=True)


def _siso_caps():
    from ieee80211_tpu.mac import (MacConfig, aggregate_vht, build_udp_mpdu)
    from ieee80211_tpu.specs import F, Mod
    from ieee80211_tpu.tx import finalize, gen_ampdu, gen_mpdu
    cfg = MacConfig(subtype=8, addr1="f4:69:d5:80:0f:a0",
                    addr2="00:c0:ca:b1:5b:e1", addr3="f4:69:d5:80:0f:a0",
                    seq=2704)
    rng = np.random.default_rng(3)
    parts = []
    n_api = 20
    for i in range(n_api):
        pl = bytes(rng.integers(0, 256, int(rng.integers(100, 900)),
                                dtype=np.uint8))
        if i % 2:
            wv = gen_ampdu(aggregate_vht([build_udp_mpdu(pl, cfg)]),
                           Mod(F.VHT, 7)).waveform
        else:
            wv = gen_mpdu(build_udp_mpdu(pl, cfg), Mod(F.HT, 5)).waveform
        parts.append(finalize(wv, multiplier=0.2, cfo_hz=float(
            rng.uniform(-5e4, 5e4)), gap=True, gap_len=800)[0])
    cap = np.concatenate(parts)
    rng2 = np.random.default_rng(7)
    big_parts = []
    for k in range(50):
        big_parts.append(np.zeros(int(rng2.integers(16, 512)), np.complex64))
        big_parts.append(cap)
    big = np.concatenate(big_parts)
    caps = [np.concatenate([np.zeros(64 + 32 * k, np.complex64), big])
            for k in range(6)]
    return caps, n_api * 50


def floor_bracket(reps=3):
    """Bound the SISO stream: (a) ingest+upload only, (b) + SIG dispatch
    + packed-meta fetch, (c) the full decode_captures. The gap between
    (b)/(c) and between (a)/(b) localizes the stream's ceiling."""
    import jax.numpy as jnp
    from ieee80211_tpu.rx import SisoReceiver
    caps, want = _siso_caps()
    total = sum(len(c) for c in caps)
    rx = SisoReceiver()
    # warm everything
    stream = rx.decode_captures(caps)
    for res_k in stream:
        ok = sum(1 for r in res_k if r.fcs_ok)
        assert ok == want, f"{ok}/{want}"

    def run_upload():
        devs = []
        t = time.perf_counter()
        for c in caps:
            t0s, cap_dev, scale, npad = rx._ingest(c)
            devs.append(cap_dev)
        s = float(np.asarray(jnp.stack(
            [jnp.sum(d[:64, 0].astype(jnp.float32)) for d in devs]).sum()))
        return time.perf_counter() - t

    def run_upload_sig():
        outs = []
        t = time.perf_counter()
        for c in caps:
            t0s, cap_dev, scale, npad = rx._ingest(c)
            packed, tc = rx._dispatch_sigs(cap_dev, scale, npad, t0s)
            packed.copy_to_host_async()
            outs.append(packed)
        for p in outs:
            np.asarray(p)
        return time.perf_counter() - t

    for r in range(reps):
        du = run_upload()
        ds = run_upload_sig()
        t = time.perf_counter()
        rx.decode_captures(caps)
        df = time.perf_counter() - t
        print(f"[floor rep{r}] upload-only {total/du/1e6:.1f} Msps "
              f"({du*1e3:.0f} ms) | +sig {total/ds/1e6:.1f} Msps "
              f"({ds*1e3:.0f} ms) | full {total/df/1e6:.1f} Msps "
              f"({df*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("mimo", "all"):
        ab_mimo()
    if which in ("floor", "all"):
        floor_bracket()
    if which in ("int8", "all"):
        ab_int8()
