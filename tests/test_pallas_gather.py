"""Interpret-mode gate for the Pallas DMA window-slice kernel.

On TPU every `ops.sync.batch_slice_iq` call routes through
ops/pallas/gather.py (whole-row DMA + in-register dynamic rotate —
the XLA gather it replaces cost as much as the entire Viterbi at the
bench shape). CPU CI never executes the TPU path, so this file runs
the SAME kernel through the Pallas interpreter and checks element-exact
agreement with the lax.dynamic_slice formulation across shape classes:
unaligned rows/lengths, full-length slices, non-multiple batches, and
boundary starts (0 and N-L).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ieee80211_tpu.ops.pallas.gather import batch_slice_iq_pallas
from ieee80211_tpu.ops import sync


def _xla_slice(x2, st, L):
    import jax
    b, n, _ = x2.shape
    xf = x2.reshape(b, 2 * n)
    seg = jax.vmap(lambda xb, s: jax.lax.dynamic_slice(
        xb, (2 * s,), (2 * L,)))(xf, st.astype(jnp.int32))
    return seg.reshape(b, L, 2)


@pytest.mark.parametrize("b,n,L", [
    (8, 500, 120),       # small, unaligned everything
    (32, 2320, 2080),    # the bench window shape
    (5, 300, 300),       # full-length slice, batch < group size
    (16, 1096, 1096),    # full-length, row not a lane multiple
    (3, 129, 64),        # tiny
])
def test_dma_slice_matches_dynamic_slice(b, n, L):
    rng = np.random.default_rng(b * 1000 + L)
    x2 = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    st = jnp.asarray(rng.integers(0, n, b).astype(np.int32))  # clamps
    a = np.asarray(_xla_slice(x2, st, L))
    p = np.asarray(batch_slice_iq_pallas(x2, st, L, interpret=True))
    np.testing.assert_array_equal(a, p)


def test_dma_slice_boundary_starts():
    rng = np.random.default_rng(0)
    b, n, L = 9, 700, 256
    x2 = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    st = jnp.asarray(np.array([0, n - L, 1, n - L - 1, 7, 128, 129,
                               255, 300], dtype=np.int32))
    a = np.asarray(_xla_slice(x2, st, L))
    p = np.asarray(batch_slice_iq_pallas(x2, st, L, interpret=True))
    np.testing.assert_array_equal(a, p)


def test_batch_slice_iq_dispatch_flag_exists():
    """The TPU dispatch is gated on sync.DMA_SLICE (module-level for
    A/Bs); CPU backends must keep using the XLA path."""
    assert hasattr(sync, "DMA_SLICE") and sync.DMA_SLICE is True
