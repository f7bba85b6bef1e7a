#!/usr/bin/env python
"""Quick stage-cost profile at the bench operating point (batch 2048).

Times (relay-safe, K-chained): full step; Viterbi alone on the same-size
LLRs; step minus Viterbi (front-end) derived.
"""
import time

import numpy as np

import bench


def k_time(fn, args, K=8, iters=8, rt=None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, c):
            s, a0 = c
            s2 = fn(a0, *a[1:])
            if jnp.issubdtype(a0.dtype, jnp.floating):
                a1 = a0 + s2 * jnp.float32(1e-30)
            else:
                a1 = a0 ^ (s2 * 1e-30).astype(a0.dtype)
            return (s + s2, a1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), a[0]))
        return s

    np.asarray(run(*args))
    dts = []
    for _ in range(iters):
        t = time.perf_counter()
        np.asarray(run(*args))
        dts.append(time.perf_counter() - t)
    return (np.median(dts) - rt) / K


def main():
    import jax
    import jax.numpy as jnp
    pipe, x, t0, mpdu = bench.build_batch(2048)
    xd, td = jnp.asarray(x), jnp.asarray(t0)

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
    print("roundtrip", rt)

    dt_full = k_time(lambda x, t: jnp.sum(
        pipe.step(x, t)["bits"][:, :8]).astype(jnp.float32), (xd, td), rt=rt)
    print("full step", dt_full)

    # Viterbi alone on same-shape LLRs
    from ieee80211_tpu.ops import coding
    n_bits = pipe.n_sym * pipe.mod.nDBPS
    n_coded = pipe.n_sym * pipe.mod.nCBPS
    llr = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2048, n_coded)).astype(np.float32))

    dt_vit = k_time(lambda l: jnp.sum(coding.viterbi_decode(
        l, pipe.mod.cr, n_bits)[:, :8]).astype(jnp.float32), (llr,), rt=rt)
    print("viterbi", dt_vit)

    # sync front alone
    from ieee80211_tpu.ops import sync
    dt_sync = k_time(lambda x, t: jnp.sum(
        sync.sync_front_iq(x, t)[1]).astype(jnp.float32), (xd, td), rt=rt)
    print("sync", dt_sync)

    # descramble alone
    bits = jnp.asarray(np.random.default_rng(1).integers(
        0, 2, (2048, n_bits), dtype=np.int32))
    dt_ds = k_time(lambda b: jnp.sum(coding.descramble(
        b)[:, :8]).astype(jnp.float32), (bits,), rt=rt)
    print("descramble", dt_ds)

    print({"full_ms": dt_full * 1e3, "viterbi_ms": dt_vit * 1e3,
           "sync_ms": dt_sync * 1e3, "descramble_ms": dt_ds * 1e3,
           "frontend_ms": (dt_full - dt_vit - dt_ds) * 1e3})


if __name__ == "__main__":
    main()
