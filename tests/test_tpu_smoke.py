"""TPU compile smoke test — run with RUN_TPU_TESTS=1 on real hardware.

Compiles and executes (a) the DEFAULT Pallas Viterbi kernel config and
(b) the flagship RxPipeline, on the actual TPU backend. This is the gate
the round-1 bf16 Mosaic regression needed: interpret-mode tests pin
numerics, but only a real Mosaic lowering proves the committed defaults
compile on the target. Run before any commit touching ops/pallas/:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -x -q

Skipped automatically when the backend is not TPU (CPU CI).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU smoke test: requires real TPU backend (RUN_TPU_TESTS=1)")


def test_default_viterbi_kernel_compiles_and_decodes():
    from ieee80211_tpu.ops.pallas.viterbi import viterbi_decode_pallas
    from ieee80211_tpu.specs import CR
    from ieee80211_tpu.tx.golden import bcc

    rng = np.random.default_rng(3)
    n_bits = 360
    bits = rng.integers(0, 2, size=(256, n_bits)).astype(np.int32)
    bits[:, -6:] = 0
    punct = np.stack([bcc(row, CR.CR34) for row in bits])
    llr = ((punct * 2.0 - 1.0)
           + rng.normal(0, 0.2, punct.shape)).astype(np.float32)
    # DEFAULT kwargs — exactly what bench.py's hot path will instantiate
    got = np.asarray(viterbi_decode_pallas(jnp.asarray(llr), CR.CR34,
                                           n_bits))
    np.testing.assert_array_equal(got, bits)


def test_flagship_rx_pipeline_compiles_and_decodes():
    """One batch of VHT MCS7 packets through the full RxPipeline on TPU —
    the exact program bench.py times (batch kept small for speed)."""
    import bench as benchmod

    pipe, x, t0, mpdu = benchmod.build_batch(64)
    out = pipe.step(jnp.asarray(x), jnp.asarray(t0))
    jax.block_until_ready(out)
    bits = np.asarray(out["bits"][0]).astype(np.uint8)
    psdu = np.packbits(bits[16:16 + pipe.psdu_len * 8],
                       bitorder="little").tobytes()
    from ieee80211_tpu.mac import deaggregate_vht
    subs = deaggregate_vht(psdu)
    assert subs and subs[0].fcs_ok and subs[0].mpdu == mpdu


def test_dma_window_slice_compiles_and_matches():
    """The Pallas DMA window-slice kernel (ops/pallas/gather.py) on real
    Mosaic: whole-row DMA + dynamic rotates, vs the XLA dynamic_slice
    formulation, element-exact on unaligned shapes and boundary starts."""
    from ieee80211_tpu.ops.pallas.gather import batch_slice_iq_pallas

    rng = np.random.default_rng(9)
    b, n, L = 66, 2321, 2080             # unaligned everything
    x2 = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))
    st = np.concatenate([[0, n - L], rng.integers(0, n - L, b - 2)])
    st = jnp.asarray(st.astype(np.int32))
    got = np.asarray(batch_slice_iq_pallas(x2, st, L))
    xf = np.asarray(x2)
    for r in range(b):
        s = int(st[r])
        np.testing.assert_array_equal(got[r], xf[r, s:s + L])
