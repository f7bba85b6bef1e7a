"""Batched channel-coding ops (JAX): soft Viterbi, (de)puncture, scramble.

TPU-native re-design of the reference's streaming Viterbi
(/root/reference/lib/decode_impl.cc:164-302 vstb_* and
tools/phy80211header.py:998-1063 procViterbiDecoder): the 64-state
add-compare-select runs as a `lax.scan` over trellis steps with the state
axis and a large packet batch vectorized on the VPU; puncturing becomes a
static scatter; the scrambler is a closed-form PRBS table lookup (no
sequential state).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..specs import CR, tables

NEG = -1e30


def _acs_tables():
    # plain numpy: caching device arrays created under a trace leaks tracers
    prev_state = tables.SV_PREV_STATE                    # [64, 2]
    prev_out = tables.SV_PREV_OUTPUT2                    # [64, 2] in 0..3
    return prev_state, prev_out


@lru_cache(maxsize=None)
def _acs_weights():
    """Gather-free ACS constants.

    The trellis is a butterfly: predecessors of state s' are
    p = 2*(s' mod 32) + d, so the metric gather is a reshape+tile, and the
    branch metric is an outer product with the per-transition output bits:
    W0[s', d] = out-bit0, W1[s', d] = out-bit1 of transition p -> s'.
    """
    po = tables.SV_PREV_OUTPUT2                           # [64, 2]
    w0 = ((po >> 1) & 1).astype(np.float32)
    w1 = (po & 1).astype(np.float32)
    return w0, w1


@lru_cache(maxsize=None)
def depuncture_slots(cr: CR, n_steps: int) -> np.ndarray:
    """Flat indices into a zeroed [n_steps*2] LLR buffer for each surviving
    (punctured-stream) position."""
    pat = tables.PUNCTURE[cr].astype(bool)
    tiled = np.tile(pat, -(-2 * n_steps // len(pat)))[: 2 * n_steps]
    return np.nonzero(tiled)[0].astype(np.int32)


def n_punctured(cr: CR, n_steps: int) -> int:
    return int(len(depuncture_slots(cr, n_steps)))


def depuncture(llrs: jnp.ndarray, cr: CR, n_steps: int) -> jnp.ndarray:
    """[..., n_coded] punctured LLRs -> [..., n_steps, 2] with zeros inserted."""
    slots = jnp.asarray(depuncture_slots(cr, n_steps))
    batch = llrs.shape[:-1]
    flat = jnp.zeros(batch + (n_steps * 2,), llrs.dtype)
    flat = flat.at[..., slots].set(llrs[..., : slots.shape[0]])
    return flat.reshape(batch + (n_steps, 2))


def viterbi_decode(llrs: jnp.ndarray, cr: CR, n_bits: int) -> jnp.ndarray:
    """Soft Viterbi decode of a zero-terminated BCC stream.

    llrs: [B, n_coded] punctured soft bits (positive = bit 1, matching the
    reference's LLR sign convention). Returns decoded bits [B, n_bits] int32.

    ACS over the 64-state trellis as lax.scan; per-step metric renorm keeps
    f32 bounded over long trellises (PSDU<=4095B => ~33k steps).
    """
    w0, w1 = _acs_weights()
    b = llrs.shape[0]
    lp = depuncture(llrs, cr, n_bits)                  # [B, n_bits, 2]
    lp = jnp.moveaxis(lp, 1, 0)                        # [T, B, 2]

    m0 = jnp.full((b, 64), NEG, dtype=jnp.float32).at[:, 0].set(0.0)

    def step(m, llr2):
        l0 = llr2[:, 0][:, None, None]
        l1 = llr2[:, 1][:, None, None]
        # predecessor metrics via reshape+tile (no gather): states 0..31 and
        # 32..63 share the same predecessor pairs (2i, 2i+1).
        m2 = m.reshape(b, 32, 2)
        mm = jnp.concatenate([m2, m2], axis=1)              # [B, 64, 2]
        cand = mm + l0 * w0 + l1 * w1
        dec = (cand[..., 1] > cand[..., 0]).astype(jnp.int8)
        new_m = jnp.max(cand, axis=-1)
        new_m = new_m - jnp.max(new_m, axis=-1, keepdims=True)
        return new_m, dec

    m_fin, decs = jax.lax.scan(step, m0, lp)           # decs [T, B, 64]

    def back(state, dec_t):
        d = jnp.take_along_axis(dec_t, state[:, None], axis=-1)[:, 0]
        bit = (state >> 5).astype(jnp.int32)
        prev = ((state & 31) << 1) + d.astype(jnp.int32)
        return prev, bit

    # Traceback from the best final state: L/HT streams carry scrambled pad
    # bits after the zero tail, so the encoder need not end in state 0.
    s0 = jnp.argmax(m_fin, axis=-1).astype(jnp.int32)
    _, bits_rev = jax.lax.scan(back, s0, decs, reverse=True)
    return jnp.moveaxis(bits_rev, 0, 1)                # [B, n_bits]


# ---------------------------------------------------------------------------
# scrambler (closed-form)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _seed_from_first7() -> np.ndarray:
    """Map the first 7 PRBS bits (LSB-first packed) -> scrambler seed."""
    inv = np.zeros(128, dtype=np.int32)
    for seed in range(1, 128):
        key = 0
        for i in range(7):
            key |= int(tables.SCRAMBLE_SEQ[seed, i]) << i
        inv[key] = seed
    return inv


@lru_cache(maxsize=None)
def _prbs_tiled(n: int) -> np.ndarray:
    reps = -(-n // 127)
    return np.stack([np.tile(tables.SCRAMBLE_SEQ[s], reps)[:n]
                     for s in range(128)]).astype(np.int32)


def descramble(bits: jnp.ndarray) -> jnp.ndarray:
    """Recover the scrambler seed from the first 7 (known-zero) service bits
    and remove the PRBS. bits: [B, N] -> [B, N] (first 7 bits zeroed).

    Parity: reference descramble (lib/decode_impl.cc:304-323) — but instead
    of running the LFSR, the seed indexes a precomputed PRBS table.
    """
    n = bits.shape[-1]
    prbs = jnp.asarray(_prbs_tiled(n))                 # [128, N]
    inv = jnp.asarray(_seed_from_first7())             # [128]
    key = jnp.sum(bits[:, :7].astype(jnp.int32)
                  * (1 << jnp.arange(7, dtype=jnp.int32)), axis=-1)
    seed = inv[key]
    return bits.astype(jnp.int32) ^ prbs[seed]


def scramble_seed_of(bits: jnp.ndarray) -> jnp.ndarray:
    inv = jnp.asarray(_seed_from_first7())
    key = jnp.sum(bits[:, :7].astype(jnp.int32)
                  * (1 << jnp.arange(7, dtype=jnp.int32)), axis=-1)
    return inv[key]
