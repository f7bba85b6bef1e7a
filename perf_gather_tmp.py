import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from bench import build_batch
    from ieee80211_tpu.ops import sync
    from ieee80211_tpu.models.pipeline import make_rx_step

    batch = 2048
    pipe, x, t0, mpdu = build_batch(batch)
    xd, td = jnp.asarray(x), jnp.asarray(t0)

    @jax.jit
    def trivial(x):
        return jnp.sum(x[:, 0, 0]) * 0 + 1.0
    np.asarray(trivial(xd))
    rts = []
    for _ in range(8):
        t = time.perf_counter(); np.asarray(trivial(xd)); rts.append(time.perf_counter() - t)
    rt = min(rts)
    print("rt", rt, flush=True)

    # correctness: decode the real packet with the DMA slice on
    sync.DMA_SLICE = True
    out = pipe.step(xd[:8], td[:8])
    bits = np.asarray(out["bits"][0]).astype(np.uint8)
    psdu = np.packbits(bits[16:16 + pipe.psdu_len * 8], bitorder="little").tobytes()
    from ieee80211_tpu.mac import deaggregate_vht
    subs = deaggregate_vht(psdu)
    assert subs and subs[0].fcs_ok and subs[0].mpdu == mpdu, "DMA-slice decode invalid"
    print("correctness gate OK", flush=True)

    K = 8
    def make(dma):
        sync.DMA_SLICE = dma
        raw = make_rx_step(pipe.mod, pipe.n_sym)
        @jax.jit
        def run(x, t):
            def body(i, c):
                s, xx = c
                s2 = jnp.sum(raw(xx, t)["bits"][:, :8]).astype(jnp.float32)
                return (s + s2, xx + s2 * jnp.float32(1e-30))
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x))
            return s
        np.asarray(run(xd, td))
        return run

    runs = {False: make(False), True: make(True)}
    sync.DMA_SLICE = True
    n_samp = x.shape[1]
    for rep in range(4):
        line = []
        for dma, fn in runs.items():
            dts = []
            for _ in range(3):
                t = time.perf_counter(); np.asarray(fn(xd, td)); dts.append(time.perf_counter() - t)
            per = (np.median(dts) - rt) / K
            line.append(f"{'dma' if dma else 'xla'} {per*1e3:.2f} ms {batch*n_samp/per/1e6:.0f} Msps")
        print(f"[rep{rep}] " + " | ".join(line), flush=True)

main()
