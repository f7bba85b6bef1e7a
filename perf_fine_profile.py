"""Finer stage profile of the headline step at batch 2048 (K-chained)."""
import time
import numpy as np
import bench

def k_time(fn, args, rt, K=8, iters=6):
    import jax, jax.numpy as jnp
    @jax.jit
    def run(*a):
        def body(i, c):
            s, a0 = c
            s2 = fn(a0, *a[1:])
            a1 = a0 + s2 * jnp.float32(1e-30) if jnp.issubdtype(a0.dtype, jnp.floating) else a0
            return (s + s2, a1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), a[0]))
        return s
    np.asarray(run(*args))
    dts = []
    for _ in range(iters):
        t = time.perf_counter(); np.asarray(run(*args)); dts.append(time.perf_counter() - t)
    return (np.median(dts) - rt) / K

def main():
    import jax, jax.numpy as jnp
    from ieee80211_tpu.ops import sync, demod, coding
    from ieee80211_tpu.utils.riq import r2c
    pipe, x, t0, mpdu = bench.build_batch(1024)
    xd, td = jnp.asarray(x), jnp.asarray(t0)
    B, W, _ = x.shape
    mod, n_sym = pipe.mod, pipe.n_sym

    @jax.jit
    def trivial(x):
        return jnp.sum(x[:, 0, 0]) * 0 + 1.0
    np.asarray(trivial(xd))
    rts = []
    for _ in range(8):
        t = time.perf_counter(); np.asarray(trivial(xd)); rts.append(time.perf_counter() - t)
    rt = min(rts)
    print("rt", rt, "window", W, flush=True)

    res = {}
    res["full"] = k_time(lambda x, t: jnp.sum(pipe.step(x, t)["bits"][:, :8]).astype(jnp.float32), (xd, td), rt)
    res["sync_front"] = k_time(lambda x, t: jnp.sum(sync.sync_front_iq(x, t)[1]).astype(jnp.float32), (xd, td), rt)
    # the big aligned window slice alone (start derived from data to avoid const-folding)
    zlen = 32 + 608 + 80 * n_sym   # 32q + data_offset(VHT,2LTF) + data
    def slice_only(x, t):
        s = t + (jnp.sum(x[:, 0, 0] * 1e-30)).astype(jnp.int32)
        z = sync.batch_slice_iq(x, s + 40, zlen)
        return jnp.sum(z[:, ::97, 0]).astype(jnp.float32)
    res["z_slice"] = k_time(slice_only, (xd, td), rt)
    # CFO ramp alone at z length
    cfo = jnp.asarray(np.random.default_rng(0).uniform(-0.01, 0.01, B).astype(np.float32))
    def ramp_only(c):
        r = sync.cfo_ramp(c, zlen)
        return jnp.sum(jnp.real(r[:, ::97])).astype(jnp.float32)
    res["cfo_ramp"] = k_time(ramp_only, (cfo,), rt)
    # window extraction + FFT of data symbols from a resident z
    z2 = jnp.asarray(np.random.default_rng(1).standard_normal((B, zlen, 2)).astype(np.float32))
    def fft_only(z2):
        z = r2c(z2)
        g = demod.fft_syms(demod.static_symbol_windows(z, 16 + 608, n_sym, nfft=64, gi=16, shift=4, stride=80))
        return jnp.sum(jnp.real(g[:, ::7, ::13])).astype(jnp.float32)
    res["winfft"] = k_time(fft_only, (z2,), rt)
    # demod folds alone
    gd2 = jnp.asarray(np.random.default_rng(3).standard_normal((B, n_sym, 64, 2)).astype(np.float32))
    ch2 = jnp.asarray(np.random.default_rng(5).standard_normal((B, 64, 2)).astype(np.float32))
    def demod_only(gd2, ch2):
        llrs = demod.demod_data_siso(r2c(gd2), r2c(ch2), mod, n_sym, 4)
        return jnp.sum(llrs[:, ::997]).astype(jnp.float32)
    res["demod"] = k_time(demod_only, (gd2, ch2), rt)
    # viterbi alone
    n_bits = n_sym * mod.nDBPS
    llr = jnp.asarray(np.random.default_rng(7).standard_normal((B, coding.n_punctured(mod.cr, n_bits))).astype(np.float32))
    res["viterbi"] = k_time(lambda l: jnp.sum(coding.viterbi_decode(l, mod.cr, n_bits)[:, :8]).astype(jnp.float32), (llr,), rt)
    print({k: round(v * 1e3, 2) for k, v in res.items()}, flush=True)

main()
