"""Per-stage floor of the Viterbi kernel skeleton: same grid, LLR DMA,
loop and metric-store structure, ACS replaced by one add. The gap
between this and the real kernel is the actual ACS cost."""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blk, chunk, TB, p2k = 1176, 8, 1024, 8

    def kernel(llr_hbm, bits_ref, m_ref, buf, sem):
        def dma(slot, c):
            return pltpu.make_async_copy(
                llr_hbm.at[pl.ds(c * chunk, chunk), :, :],
                buf.at[slot], sem.at[slot])
        dma(0, 0).start()
        m_ref[:] = jnp.zeros((64, TB), jnp.float32)
        n_ch = n_blk // chunk
        def fwd_chunk(c, _):
            slot = c % 2
            @pl.when(c + 1 < n_ch)
            def _():
                dma((c + 1) % 2, c + 1).start()
            dma(slot, c).wait()
            def fwd_step(tt, _):
                llr2 = buf[slot, tt]
                m_ref[:] = m_ref[:] + jnp.sum(llr2[:1]) * 1e-30 + 1.0
                return 0
            jax.lax.fori_loop(0, chunk, fwd_step, 0)
            return 0
        jax.lax.fori_loop(0, n_ch, fwd_chunk, 0)
        bits_ref[:] = m_ref[:].astype(jnp.int32)

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, TB), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((64, TB), jnp.float32),
            pltpu.VMEM((2, chunk, p2k, TB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_blk, p2k, TB)).astype(np.float32))
    @jax.jit
    def trivial(x):
        return jnp.sum(x[0, 0]) * 0 + 1.0
    np.asarray(trivial(x))
    rts = []
    for _ in range(8):
        t = time.perf_counter(); np.asarray(trivial(x)); rts.append(time.perf_counter() - t)
    rt = min(rts)
    K = 16
    @jax.jit
    def run(x):
        def body(i, c):
            s, xx = c
            o = call(xx)
            s2 = jnp.sum(o[0, :8]).astype(jnp.float32)
            return (s + s2, xx + s2 * jnp.float32(1e-30))
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x))
        return s
    np.asarray(run(x))
    for rep in range(3):
        dts = []
        for _ in range(3):
            t = time.perf_counter(); np.asarray(run(x)); dts.append(time.perf_counter() - t)
        per = (np.median(dts) - rt) / K
        print(f"[rep{rep}] skeleton {per*1e3:.2f} ms = {per/n_blk*1e6:.2f} us/stage", flush=True)

main()
