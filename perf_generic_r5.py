#!/usr/bin/env python
"""Branch-dispatch floor: per-branch decode loop vs table-driven generic
decoder in the sharded auto-detect loop (VERDICT r4 item 5).

The per-branch loop costs ~7 ms/branch (launch + sequential-trellis
latency) regardless of traffic mix; the generic decoder runs ONE
shared-trellis program whose per-window config comes from gathered
tables, so its cost is ~one worst-case decode independent of branch
count. Measured on the 1-device mesh at 8/16/25 branches, 64 planted
packets cycling through the branch set.
"""
import sys
import time

import numpy as np


def main(k_windows=64):
    import jax
    import jax.numpy as jnp
    from ieee80211_tpu.mac import MacConfig, aggregate_vht, build_udp_mpdu
    from ieee80211_tpu.parallel import make_phy_mesh
    from ieee80211_tpu.parallel.sharded import (branch_window_len,
                                                sharded_capture_decode_auto)
    from ieee80211_tpu.specs import F, Mod
    from ieee80211_tpu.specs.modulation import (ppdu_params_aggregate,
                                                ppdu_params_nonaggregate)
    from ieee80211_tpu.tx import finalize, gen_ampdu, gen_mpdu
    from ieee80211_tpu.utils import c2r

    cfg = MacConfig(addr1="f4:69:d5:80:0f:a0", addr2="00:c0:ca:b1:5b:e1",
                    addr3="f4:69:d5:80:0f:a0", seq=2704)
    mpdu = build_udp_mpdu(b"123456789012345678901234567890", cfg)
    ampdu = aggregate_vht([mpdu])
    all_mods = ([Mod(F.VHT, m) for m in range(9)]
                + [Mod(F.HT, m) for m in range(8)]
                + [Mod(F.L, m) for m in range(8)])

    def build(mods):
        branches = []
        for m in mods:
            pp = (ppdu_params_aggregate(m, len(ampdu)) if m.fmt == F.VHT
                  else ppdu_params_nonaggregate(m, len(mpdu)))
            branches.append((m, pp.n_sym))
        return tuple(branches)

    mesh = make_phy_mesh(1, sp=1)
    for n_br in (8, 16, 25):
        mods = all_mods[:n_br]
        branches = build(mods)
        w = max(branch_window_len(m, c) for m, c in branches)
        parts = []
        for i in range(k_windows):
            m = mods[i % len(mods)]
            wv = (gen_ampdu(ampdu, m).waveform if m.fmt == F.VHT
                  else gen_mpdu(mpdu, m).waveform)
            wv = finalize(wv, multiplier=0.2, cfo_hz=4e3 * ((i % 5) - 2),
                          gap=False)[0]
            parts.append(np.zeros(700, np.complex64))
            parts.append(wv.astype(np.complex64))
        seg = np.concatenate(parts)
        t_len = -(-(len(seg) + 2 * w) // 512) * 512
        cap = np.zeros((1, t_len), np.complex64)
        cap[0, :len(seg)] = seg
        x = c2r(cap)

        for label, gen in (("branch-loop", False), ("generic", True)):
            run = sharded_capture_decode_auto(
                mesh, branches, w, k_per_shard=2 * k_windows, generic=gen)
            out = run(x)
            jax.block_until_ready(out)
            n_ok = int(np.asarray(out["ok"]).sum())
            ts = []
            for _ in range(5):
                t = time.perf_counter()
                jax.block_until_ready(run(x))
                ts.append(time.perf_counter() - t)
            print(f"{n_br:2d} branches {label:11s}: "
                  f"{np.median(ts)*1e3:7.1f} ms  "
                  f"({n_ok}/{k_windows} decoded)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
