"""Reference-scale PDR acceptance sweep (SISO + 2x2 MIMO).

Re-creates the reference's actual RX-quality acceptance test
(tools/performance/perf_siso.py:126-180 and perf_sumimo.py): 100 packets x
SNR 0..30 dB x every MCS — SISO {L0-7, HT0-7, VHT0-8} and 2x2 {HT8-15,
VHT0-8} — at the reference operating point (500 B payload, signal amp
0.1875), decoded through the FULL RX chain with FCS-exact acceptance.

Writes a JSON artifact with the curves plus derived waterfall positions
(SNR @ 90% PDR) that tests/test_pdr_acceptance.py asserts against.

TPU notes: packets are decoded 100-per-batch on device; decoded bits are
packed to bytes ON DEVICE before the host fetch (the relay link runs at
~25 MB/s — fetching int32 bit planes would dominate the sweep).
"""
from __future__ import annotations

import json
import sys
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..mac import deaggregate_vht
from ..specs import F
from ..specs.crc import fcs_ok
from ..utils import c2r
from .pdr import (SIG_AMP, MimoRxPipeline, _build_mimo_packet,
                  _build_packet)

_BITW = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)


def _packed_step(step_fn):
    """Wrap a pipeline step: add on-device AWGN, decode, pack bits->bytes
    (little bit order, matching np.packbits(bitorder='little'))."""
    @jax.jit
    def run(x2, t0, key, namp):
        noise = jax.random.normal(key, x2.shape, jnp.float32) \
            * (namp / np.sqrt(2))
        bits = step_fn(x2 + noise, t0)["bits"].astype(jnp.uint8)
        b, n = bits.shape
        by = bits[:, : n // 8 * 8].reshape(b, -1, 8)
        return jnp.sum(by * _BITW, axis=-1, dtype=jnp.uint8)
    return run


def _count_ok(pkts: np.ndarray, psdu_len: int, mpdu: bytes,
              ampdu: bool) -> int:
    n_ok = 0
    for row in pkts:
        psdu = row[2:2 + psdu_len].tobytes()   # skip 16 SERVICE bits
        if ampdu:
            subs = deaggregate_vht(psdu)
            ok = any(s.fcs_ok and s.mpdu == mpdu for s in subs)
        else:
            ok = fcs_ok(psdu) and psdu == mpdu
        n_ok += bool(ok)
    return n_ok


def _sweep_curves(build, pipe_cls, configs, snr_db, n_pkt, payload_len,
                  seed, log) -> Dict[str, List[float]]:
    curves: Dict[str, List[float]] = {}
    key = jax.random.PRNGKey(seed)
    for fmt, mcs in configs:
        t_start = time.time()
        mod, pp, mpdu, wave = build(fmt, mcs, payload_len, seed)
        pipe = pipe_cls(mod, pp.n_sym, pp.psdu_len)
        w = pipe.window_len()
        if wave.ndim == 1:                       # SISO
            x = np.zeros(w, dtype=np.complex64)
            seg = wave[64 - 8:]
            x[:min(w, len(seg))] = seg[:min(w, len(seg))]
            x2 = np.tile(c2r(x)[None], (n_pkt, 1, 1))
        else:                                    # 2 RX chains
            x = np.zeros((2, w), dtype=np.complex64)
            seg = wave[:, 64 - 8:]
            n = min(w, seg.shape[1])
            x[:, :n] = seg[:, :n]
            xr = np.stack([np.real(x), np.imag(x)], -1).astype(np.float32)
            x2 = np.tile(xr[None], (n_pkt, 1, 1, 1))
        xd = jnp.asarray(x2)
        td = jnp.zeros(n_pkt, jnp.int32)
        run = _packed_step(pipe._step if hasattr(pipe, "_step")
                           else pipe.step)
        curve = []
        for s in snr_db:
            key, sub = jax.random.split(key)
            namp = jnp.float32(SIG_AMP / (10 ** (s / 20)))
            pkts = np.asarray(run(xd, td, sub, namp))
            curve.append(_count_ok(pkts, pipe.psdu_len, mpdu,
                                   ampdu=fmt == F.VHT) / n_pkt)
        name = f"{fmt.name}{mcs}"
        curves[name] = curve
        log(f"{name}: waterfall(90%)={_snr_at(snr_db, curve, 0.9)} "
            f"pdr@30={curve[-1]:.2f} [{time.time() - t_start:.0f}s]")
    return curves


def _snr_at(snr_db: Sequence[float], curve: Sequence[float],
            thresh: float) -> Optional[float]:
    """Lowest swept SNR from which PDR stays >= thresh (None if never)."""
    for i in range(len(curve)):
        if all(p >= thresh for p in curve[i:]):
            return snr_db[i]
    return None


def run_acceptance(n_pkt: int = 100, payload_len: int = 500,
                   snr_db: Optional[Sequence[float]] = None, seed: int = 0,
                   siso: bool = True, mimo: bool = True,
                   out_path: Optional[str] = None, quiet: bool = False):
    from .pdr import RxPipeline  # noqa: F401  (SISO pipe via _build_packet)
    from ..models import RxPipeline as _Rx

    log = (lambda m: None) if quiet else \
        (lambda m: print(m, file=sys.stderr, flush=True))
    if snr_db is None:
        snr_db = list(range(0, 31))
    result = {"n_pkt": n_pkt, "payload_len": payload_len,
              "snr_db": list(snr_db), "sig_amp": SIG_AMP,
              "backend": jax.default_backend(), "curves": {}}
    if siso:
        configs = ([(F.L, m) for m in range(8)]
                   + [(F.HT, m) for m in range(8)]
                   + [(F.VHT, m) for m in range(9)])
        result["curves"]["siso"] = _sweep_curves(
            _build_packet, _Rx, configs, snr_db, n_pkt, payload_len,
            seed, log)
    if mimo:
        configs = ([(F.HT, m) for m in range(8, 16)]
                   + [(F.VHT, m) for m in range(9)])
        result["curves"]["mimo_2x2"] = _sweep_curves(
            _build_mimo_packet, MimoRxPipeline, configs, snr_db, n_pkt,
            payload_len, seed, log)
    # derived waterfall table (SNR at sustained 90% PDR)
    result["waterfall_90pct"] = {
        grp: {k: _snr_at(snr_db, v, 0.9) for k, v in cs.items()}
        for grp, cs in result["curves"].items()}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f)
    return result


def main():
    import argparse
    ap = argparse.ArgumentParser(description="reference-scale PDR sweep")
    ap.add_argument("--npkt", type=int, default=100)
    ap.add_argument("--payload", type=int, default=500)
    ap.add_argument("--out", default="artifacts/pdr_acceptance.json")
    ap.add_argument("--no-siso", action="store_true")
    ap.add_argument("--no-mimo", action="store_true")
    ap.add_argument("--snr", type=float, nargs="*", default=None)
    args = ap.parse_args()
    res = run_acceptance(n_pkt=args.npkt, payload_len=args.payload,
                         snr_db=args.snr, siso=not args.no_siso,
                         mimo=not args.no_mimo, out_path=args.out)
    print(json.dumps(res["waterfall_90pct"]))


if __name__ == "__main__":
    main()
