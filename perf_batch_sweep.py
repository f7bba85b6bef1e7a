import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from bench import build_batch

    pipe0, x0, t00, mpdu = build_batch(8)
    results = {}
    for batch in (256, 512, 768, 1024, 1536, 2048):
        pipe, x, t0, _ = build_batch(batch)
        xd, td = jnp.asarray(x), jnp.asarray(t0)
        @jax.jit
        def trivial(x):
            return jnp.sum(x[:, 0, 0]) * 0 + 1.0
        np.asarray(trivial(xd))
        rts = []
        for _ in range(6):
            t = time.perf_counter(); np.asarray(trivial(xd)); rts.append(time.perf_counter() - t)
        rt = min(rts)
        K = 8
        @jax.jit
        def run(x, t):
            def body(i, c):
                s, xx = c
                s2 = jnp.sum(pipe.step(xx, t)["bits"][:, :8]).astype(jnp.float32)
                return (s + s2, xx + s2 * jnp.float32(1e-30))
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x))
            return s
        np.asarray(run(xd, td))
        dts = []
        for _ in range(6):
            t = time.perf_counter(); np.asarray(run(xd, td)); dts.append(time.perf_counter() - t)
        per = (np.median(dts) - rt) / K
        sps = batch * x.shape[1] / per
        results[batch] = (per * 1e3, sps / 1e6)
        print(f"batch {batch}: {per*1e3:.2f} ms = {sps/1e6:.0f} Msps", flush=True)
    print(results)

main()
