"""Batched synchronization ops: STF trigger, LTF fine sync, CFO estimation.

TPU-native re-design of the reference front-end
(presiso hier block + lib/trigger_impl.cc + lib/sync_impl.cc): the sliding
auto-correlations are cumulative-sum differences over the whole capture (one
fused pass, no per-sample loop), and the LTF plateau search is an argmax /
edge-midpoint reduction over a static lag window.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Geometry of the 20 MHz preamble relative to the STF start (our TX layout,
# identical to the reference golden model): STF [0,160), LTF field [160,320)
# with double-GI [160,192) and two 64-sample periods [192,320), L-SIG at 320.
LTF_FIELD = 160
LTF_DATA = 192
LSIG = 320


def _movsum(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Moving sum over trailing axis, output length N - w + 1."""
    c = jnp.cumsum(x, axis=-1)
    zero = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([zero, c], axis=-1)
    return c[..., w:] - c[..., :-w]


def stf_autocorr(x: jnp.ndarray, lag: int = 16, win: int = 16) -> jnp.ndarray:
    """Normalized 16-lag auto-correlation magnitude of a capture.

    x: [..., N] complex. Returns [..., N - lag - win + 1] in [0, 1].
    (Parity: presiso delay-16/conj-multiply/moving-average front-end,
    examples/presiso.grc, and tools/pktRxExample.py:117-151.)
    """
    prod = x[..., :-lag] * jnp.conj(x[..., lag:])
    pwr = jnp.abs(x) ** 2
    num = jnp.abs(_movsum(prod, win))
    p1 = _movsum(pwr[..., :-lag], win)
    p2 = _movsum(pwr[..., lag:], win)
    den = jnp.sqrt(p1 * p2) + 1e-12
    return num / den


def coarse_cfo(x: jnp.ndarray, t0: jnp.ndarray, n_prod: int = 144,
               lag: int = 16) -> jnp.ndarray:
    """Coarse CFO (rad/sample) from the STF: angle of the averaged lag-16
    product over the STF span. x: [B, N], t0: [B] STF start."""
    def one(xb, tb):
        w = jax.lax.dynamic_slice(xb, (tb,), (n_prod + lag,))
        acc = jnp.sum(w[:n_prod] * jnp.conj(w[lag:lag + n_prod]))
        return jnp.arctan2(jnp.imag(acc), jnp.real(acc)) / lag
    return jax.vmap(one)(x, t0)


def ltf_sync(x: jnp.ndarray, t0: jnp.ndarray, cfo_rad: jnp.ndarray,
             n_lag: int = 176, thresh: float = 0.88):
    """Fine timing + fine CFO from the L-LTF 64-lag auto-correlation.

    x: [B, N]; t0: [B] approximate STF start (from the trigger);
    cfo_rad: [B] coarse CFO (rad/sample, compensation sign).

    The 64-lag correlation over the window starting at t0+80 is a trapezoid
    whose plateau is centered where the 128-sample correlation window sits
    wholly inside the periodic LTF region; the midpoint of the
    above-threshold region locates the LTF independently of the trigger
    error. Returns (ltf_data_start [B], cfo_total_rad [B], snr_metric [B]).
    (Parity: lib/sync_impl.cc:156-196 ltf_autoCorrelation/ltf_cfo; lag range
    extended to cover both plateau edges so no empirical offset is needed.)
    """
    win = n_lag + 128

    def one(xb, tb, wrad):
        y = jax.lax.dynamic_slice(xb, (tb + 80,), (win,))
        # coarse CFO compensation over the window
        y = y * jnp.exp(1j * wrad * jnp.arange(win, dtype=jnp.float32))
        prod = y[:-64] * jnp.conj(y[64:])
        pwr = jnp.abs(y) ** 2
        num = _movsum(prod, 64)
        p1 = _movsum(pwr[:-64], 64)
        p2 = _movsum(pwr[64:], 64)
        ac = jnp.abs(num) / (jnp.sqrt(p1 * p2) + 1e-12)
        ac = ac[:n_lag]
        mx = jnp.max(ac)
        mask = ac >= thresh * mx
        idx = jnp.arange(n_lag)
        first = jnp.min(jnp.where(mask, idx, n_lag))
        last = jnp.max(jnp.where(mask, idx, -1))
        d_mid = (first + last) // 2
        # plateau center d=96 corresponds to LTF data start at t0+80+d+16
        ltf_start = tb + 80 + d_mid + 16
        # fine CFO over the two LTF periods (after coarse compensation)
        z = jax.lax.dynamic_slice(xb, (ltf_start,), (128,))
        z = z * jnp.exp(1j * wrad * jnp.arange(128, dtype=jnp.float32))
        acc = jnp.sum(z[:64] * jnp.conj(z[64:]))
        fine = jnp.arctan2(jnp.imag(acc), jnp.real(acc)) / 64
        snr = 10.0 * jnp.log10(jnp.maximum(mx / jnp.maximum(1 - mx, 1e-6),
                                           1e-6))
        return ltf_start, wrad + fine, snr

    return jax.vmap(one)(x, t0, cfo_rad)


def apply_cfo_correction(x: jnp.ndarray, cfo_rad: jnp.ndarray) -> jnp.ndarray:
    """Multiply [B, N] by exp(j * cfo_rad * n) (compensation ramp)."""
    n = x.shape[-1]
    ramp = jnp.arange(n, dtype=jnp.float32)
    return x * jnp.exp(1j * cfo_rad[:, None] * ramp[None, :])


# ---------------------------------------------------------------------------
# capture-level trigger (host-side helper, vectorized numpy)
# ---------------------------------------------------------------------------


def find_triggers_np(x: np.ndarray, thresh: float = 0.5, plateau: int = 20,
                     min_gap: int = 400) -> np.ndarray:
    """Find STF trigger positions in a long 1-D capture.

    Host front-end analog of trigger_impl (lib/trigger_impl.cc:75-110):
    a trigger fires where the 16-lag STF auto-correlation stays above
    `thresh` for `plateau` consecutive samples. Returns approximate STF
    start indices (the rise point of each plateau). Uses the native C++
    runtime (native/phyrt.cc) when available; numpy fallback below.
    """
    x = np.asarray(x)
    from ..native import find_triggers as _native_triggers
    nt = _native_triggers(x, thresh=thresh, plateau=plateau, min_gap=min_gap)
    if nt is not None:
        return nt
    prod = x[:-16] * np.conj(x[16:])
    pwr = np.abs(x) ** 2
    kern = np.ones(16)
    num = np.abs(np.convolve(prod, kern, mode="valid"))
    p1 = np.convolve(pwr[:-16], kern, mode="valid")
    p2 = np.convolve(pwr[16:], kern, mode="valid")
    ac = num / (np.sqrt(p1 * p2) + 1e-12)
    above = ac > thresh
    # run-length: count consecutive True
    run = np.zeros(len(above), dtype=np.int64)
    cnt = 0
    starts = []
    last = -min_gap
    for i, a in enumerate(above):
        cnt = cnt + 1 if a else 0
        run[i] = cnt
        if cnt == plateau:
            s = i - plateau + 1
            if s - last >= min_gap:
                starts.append(s)
                last = s
    return np.asarray(starts, dtype=np.int64)
