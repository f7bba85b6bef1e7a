import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N2, L2 = 64, 4640, 4224   # L2 lane-aligned (33*128)

def kernel(starts, x_hbm, out_hbm, sems):
    def dma(r):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r * N2 + starts[r], L2)],
            out_hbm.at[pl.ds(r * L2, L2)],
            sems.at[r % 8],
        )
    def body(r, _):
        @pl.when(r >= 8)
        def _():
            dma(r - 8).wait()
        dma(r).start()
        return 0
    jax.lax.fori_loop(0, B, body, 0)
    def drain(r, _):
        dma(r).wait()
        return 0
    jax.lax.fori_loop(B - 8, B, drain, 0)

call = pl.pallas_call(
    kernel,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
    ),
    out_shape=jax.ShapeDtypeStruct((B * L2,), jnp.float32),
)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(B * N2).astype(np.float32))
st = jnp.asarray(rng.integers(0, N2 - L2, B).astype(np.int32))
out = np.asarray(call(st, x)).reshape(B, L2)
xn = np.asarray(x)
ok = all(np.array_equal(out[r], xn[r * N2 + int(st[r]): r * N2 + int(st[r]) + L2]) for r in range(B))
print("1-D arbitrary-source DMA:", "OK" if ok else "WRONG DATA")
