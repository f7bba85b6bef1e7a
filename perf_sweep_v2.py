#!/usr/bin/env python
"""Sweep Viterbi kernel (radix, tb, pack, renorm) with K-loop timing."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ieee80211_tpu.ops.pallas.viterbi import viterbi_decode_pallas
from ieee80211_tpu.specs import CR
from ieee80211_tpu.tx.golden import bcc_encode, puncture

B, N_SYM, N_DBPS, K, ITERS = 2048, 18, 260, 8, 6


def main():
    rng = np.random.default_rng(0)
    n_bits = N_SYM * N_DBPS
    bits = rng.integers(0, 2, (1, n_bits), dtype=np.int32)
    coded = puncture(bcc_encode(bits[0]), CR.CR56)
    llr1 = (coded * 2.0 - 1.0).astype(np.float32)
    llrs = np.tile(llr1, (B, 1)) + rng.normal(0, 0.4, (B, len(llr1)))
    ll = jnp.asarray(llrs.astype(np.float32))

    @jax.jit
    def trivial(x):
        return jnp.sum(x[:, 0]) * 0 + 1.0
    np.asarray(trivial(ll))
    rts = []
    for _ in range(8):
        t = time.perf_counter()
        np.asarray(trivial(ll))
        rts.append(time.perf_counter() - t)
    rt = min(rts)
    print(f"roundtrip {rt*1e3:.2f} ms")

    ref = None
    cases = [
        dict(radix=4, tb=512, pack=2, renorm=16),   # current default
        dict(radix=4, tb=2048, pack=2, renorm=16),
        dict(radix=4, tb=2048, pack=2, renorm=64),
        dict(radix=3, tb=2048, pack=2, renorm=16),
        dict(radix=3, tb=2048, pack=2, renorm=64),
        dict(radix=4, tb=2048, pack=1, renorm=16),
        dict(radix=4, tb=1024, pack=2, renorm=64),
    ]
    for kw in cases:
        def fn(l):
            return viterbi_decode_pallas(l, CR.CR56, n_bits, **kw)

        @jax.jit
        def run(l):
            def body(i, c):
                s, xx = c
                s2 = jnp.sum(fn(xx).astype(jnp.float32)[:8, :8])
                return (s + s2, xx + s2 * jnp.float32(1e-30))
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), l))
            return s

        try:
            out = np.asarray(jax.jit(fn)(ll))
        except Exception as e:
            print(f"{kw}: FAIL {str(e)[:100]}")
            continue
        if ref is None:
            ref = out
        ok = np.array_equal(out, ref)
        np.asarray(run(ll))
        ts = []
        for _ in range(ITERS):
            t = time.perf_counter()
            np.asarray(run(ll))
            ts.append(time.perf_counter() - t)
        dt = (np.median(ts) - rt) / K
        print(f"{kw}: {dt*1e3:7.2f} ms  bits_match={ok}")


if __name__ == "__main__":
    main()
