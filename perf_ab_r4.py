#!/usr/bin/env python
"""Round-4 perf A/Bs on TPU (honest timing: K-chained scalar-returning
jit + round-trip subtraction, per CLAUDE.md measurement notes):

  1. Pallas Viterbi LLR/metric storage dtype: f32 vs bf16, END TO END on
     the headline RX pipeline (VERDICT #5 — the microbench trap notes say
     only the end-to-end number counts).
  2. viterbi_decode_blocked (overlap-save XLA scan) vs the Pallas kernel
     on the same long-trellis workload (VERDICT #8 — keep only with a
     number attached).
  3. Auto-detect sharded-loop branch cost at 8 branches: full-width
     masked decode vs capacity-routed gather (VERDICT weak #3).

Usage: python perf_ab_r4.py [section ...] (default: all)
"""
import sys
import time

import numpy as np


def _timer():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return jnp.sum(x[:8]) * 0 + 1.0

    probe = jnp.arange(64, dtype=jnp.float32)
    np.asarray(trivial(probe))
    rts = []
    for _ in range(8):
        t = time.perf_counter()
        np.asarray(trivial(probe))
        rts.append(time.perf_counter() - t)
    return min(rts)


def _k_loop(fn, k):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, t):
        def body(i, c):
            s, xx = c
            s2 = fn(xx, t)
            return (s + s2, xx + s2 * jnp.float32(1e-30))
        s, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
        return s
    return run


def _median_time(run, args, iters=8):
    np.asarray(run(*args))     # warm/compile
    ts = []
    for _ in range(iters):
        t = time.perf_counter()
        np.asarray(run(*args))
        ts.append(time.perf_counter() - t)
    return float(np.median(ts))


def ab_dtype(batch=2048, iters=10):
    import jax.numpy as jnp
    from bench import build_batch
    from ieee80211_tpu.ops.pallas import viterbi as V
    from ieee80211_tpu.models import RxPipeline

    rt = _timer()
    K = 8
    results = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        V.DTYPE = dt
        pipe, x, t0, mpdu = build_batch(batch)
        # fresh pipeline object -> fresh trace under the new module DTYPE
        pipe = RxPipeline(pipe.mod, pipe.n_sym, pipe.psdu_len)
        xd = jnp.asarray(x)
        td = jnp.asarray(t0)
        # correctness gate under this dtype
        out = pipe.step(xd, td)
        bits = np.asarray(out["bits"][0]).astype(np.uint8)
        psdu = np.packbits(bits[16:16 + pipe.psdu_len * 8],
                           bitorder="little").tobytes()
        from ieee80211_tpu.mac import deaggregate_vht
        subs = deaggregate_vht(psdu)
        ok = bool(subs and subs[0].fcs_ok and subs[0].mpdu == mpdu)
        run = _k_loop(lambda xx, tt: jnp.sum(
            pipe.step(xx, tt)["bits"][:, :8]).astype(jnp.float32), K)
        dts = []
        np.asarray(run(xd, td))
        for _ in range(iters):
            t = time.perf_counter()
            np.asarray(run(xd, td))
            dts.append(time.perf_counter() - t)
        dt_s = max((np.median(dts) - rt) / K, 1e-9)
        sps = batch * x.shape[1] / dt_s
        results[name] = (sps, ok)
        print(f"viterbi dtype {name}: {sps/1e6:.1f} Msps end-to-end "
              f"(decode_ok={ok})", flush=True)
    V.DTYPE = jnp.float32
    return results


def ab_blocked(batch=2048):
    import jax
    import jax.numpy as jnp
    from ieee80211_tpu.ops import coding
    from ieee80211_tpu.ops.pallas.viterbi import viterbi_decode_pallas
    from ieee80211_tpu.specs import CR

    rt = _timer()
    n_bits = 13184                      # headline VHT7 trellis length
    rng = np.random.default_rng(0)
    n_coded = coding.n_punctured(CR.CR34, n_bits)
    llrs = jnp.asarray(rng.standard_normal((batch, n_coded))
                       .astype(np.float32))
    K = 4

    def mk(fn):
        @jax.jit
        def run(x, t):
            def body(i, c):
                s, xx = c
                s2 = jnp.sum(fn(xx)[:, :8]).astype(jnp.float32)
                return (s + s2, xx + s2 * jnp.float32(1e-30))
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x))
            return s
        return run

    # measured 2026-08-21 (this script, pre-deletion): pallas 24.6 ms vs
    # blocked_xla 582.6 ms per call at batch 2048 / 13184 bits — the
    # overlap-save XLA-scan decoder was deleted on that number
    # (ops/coding.py note). Only the Pallas row remains runnable.
    for name, fn in (
        ("pallas", lambda x: viterbi_decode_pallas(x, CR.CR34, n_bits)),
    ):
        run = mk(fn)
        dt_s = max((_median_time(run, (llrs, None), iters=5) - rt) / K,
                   1e-9)
        print(f"viterbi {name}: {dt_s*1e3:.1f} ms / call "
              f"(batch {batch}, {n_bits} bits)", flush=True)


def ab_branch_cost(k_windows=64):
    """Auto-loop branch cost on a 1-device mesh: full-width vs routed."""
    import jax
    import jax.numpy as jnp
    from ieee80211_tpu.mac import MacConfig, aggregate_vht, build_udp_mpdu
    from ieee80211_tpu.parallel import make_phy_mesh
    from ieee80211_tpu.parallel.sharded import sharded_capture_decode_auto2
    from ieee80211_tpu.rx.mimo import MrcDataDecoder
    from ieee80211_tpu.specs import BW, F, Mod
    from ieee80211_tpu.specs.modulation import (ppdu_params_aggregate,
                                                ppdu_params_nonaggregate)
    from ieee80211_tpu.tx import finalize, gen_ampdu, gen_mpdu
    from ieee80211_tpu.utils import c2r

    rt = _timer()
    cfg = MacConfig(addr1="f4:69:d5:80:0f:a0", addr2="00:c0:ca:b1:5b:e1",
                    addr3="f4:69:d5:80:0f:a0", seq=2704)
    mpdu = build_udp_mpdu(b"123456789012345678901234567890", cfg)
    ampdu = aggregate_vht([mpdu])
    # 8 decode branches (2 formats x 4 MCS)
    mods = ([Mod(F.VHT, m) for m in (0, 2, 4, 7)]
            + [Mod(F.HT, m) for m in (0, 2, 4, 7)])
    branches = []
    for m in mods:
        pp = (ppdu_params_aggregate(m, len(ampdu)) if m.fmt == F.VHT
              else ppdu_params_nonaggregate(m, len(mpdu)))
        branches.append((m, pp.n_sym))
    w = max(MrcDataDecoder(m, c).window_capacity() for m, c in branches)
    mesh = make_phy_mesh(1, sp=1)

    # capture with k_windows packets cycling through the branch mods
    h1 = np.array([0.9 - 0.3j, 0.5 + 0.8j])
    parts = []
    for i in range(k_windows):
        m = mods[i % len(mods)]
        wv = (gen_ampdu(ampdu, m).waveform if m.fmt == F.VHT
              else gen_mpdu(mpdu, m).waveform)
        wv = finalize(wv, multiplier=0.2, cfo_hz=4e3 * ((i % 5) - 2),
                      gap=False)[0]
        parts.append(np.zeros((2, 700), np.complex64))
        parts.append(np.stack([h1[0] * wv, h1[1] * wv]).astype(np.complex64))
    seg = np.concatenate(parts, axis=1)
    t_len = -(-(seg.shape[1] + 2 * w) // 512) * 512
    cap = np.zeros((1, 2, t_len), np.complex64)
    cap[0, :, :seg.shape[1]] = seg
    x = c2r(cap)

    for label, bcap in (("full-width", None),
                        ("routed cap=16", 16),
                        ("routed cap=8", 8)):
        run = sharded_capture_decode_auto2(mesh, tuple(branches), w,
                                           k_per_shard=2 * k_windows,
                                           branch_cap=bcap)
        out = run(x)
        jax.block_until_ready(out)
        n_ok = int(np.asarray(out["ok"]).sum())
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            jax.block_until_ready(run(x))
            ts.append(time.perf_counter() - t)
        print(f"auto-loop 8 branches {label}: "
              f"{(np.median(ts) - rt)*1e3:.1f} ms "
              f"({n_ok}/{k_windows} decoded)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["dtype", "blocked", "branch"]
    if "dtype" in which:
        ab_dtype()
    if "blocked" in which:
        ab_blocked()
    if "branch" in which:
        ab_branch_cost()
