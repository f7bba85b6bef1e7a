"""Dual-chain sharded capture->decode loop (sharded_capture_decode_auto2):
the one-program mesh analog of the reference rx2 flowgraph
(/root/reference/examples/rx2.grc), on the virtual 8-device CPU mesh.

Covers: MRC SISO + 2x2 branches, in-graph NDP LTF extraction,
capacity-routed vs full-width branch execution parity, branch-overflow
flagging, and cross-shard trigger dedup.
"""
import numpy as np
import pytest

from ieee80211_tpu.mac import MacConfig, aggregate_vht, build_udp_mpdu, \
    deaggregate_vht
from ieee80211_tpu.parallel import make_phy_mesh
from ieee80211_tpu.parallel.sharded import sharded_capture_decode_auto2
from ieee80211_tpu.rx.mimo import MrcDataDecoder
from ieee80211_tpu.specs import BW, F, Mod
from ieee80211_tpu.specs.crc import fcs_ok
from ieee80211_tpu.specs.modulation import (ppdu_params_aggregate,
                                            ppdu_params_nonaggregate)
from ieee80211_tpu.tx import finalize, gen_ampdu, gen_mpdu
from ieee80211_tpu.utils import c2r

CFG = MacConfig(addr1="f4:69:d5:80:0f:a0", addr2="00:c0:ca:b1:5b:e1",
                addr3="f4:69:d5:80:0f:a0", seq=2704)


def _setup():
    mpdu = build_udp_mpdu(b"123456789012345678901234567890", CFG)
    ampdu = aggregate_vht([mpdu])
    mod_l, mod_vht = Mod(F.L, 7), Mod(F.VHT, 7)
    mod_22 = Mod(F.HT, 12, BW.BW20, 2)
    pp_l = ppdu_params_nonaggregate(mod_l, len(mpdu))
    pp_vht = ppdu_params_aggregate(mod_vht, len(ampdu))
    pp_22 = ppdu_params_nonaggregate(mod_22, len(mpdu))
    h1 = np.array([0.9 - 0.3j, 0.5 + 0.8j])
    h22 = np.array([[1.1 + 0.2j, 0.3 - 0.5j], [-0.4 + 0.6j, 0.9 + 0.1j]])
    w_l = np.stack([h1[0], h1[1]])[:, None] * finalize(
        gen_mpdu(mpdu, mod_l).waveform, multiplier=0.2, cfo_hz=12000.0,
        gap=False)[0][None, :]
    w_vht = np.stack([h1[0], h1[1]])[:, None] * finalize(
        gen_ampdu(ampdu, mod_vht).waveform, multiplier=0.2, cfo_hz=5000.0,
        gap=False)[0][None, :]
    w_22 = h22 @ finalize(gen_mpdu(mpdu, mod_22).waveform, multiplier=0.2,
                          cfo_hz=-8000.0, gap=False)
    w_ndp = h22 @ finalize(gen_ampdu(b"", Mod(F.VHT, 0, BW.BW20, 2)).waveform,
                           multiplier=0.2, cfo_hz=3000.0, gap=False)
    branches = ((mod_l, pp_l.n_sym), (mod_vht, pp_vht.n_sym),
                (mod_22, pp_22.n_sym))
    w = max(MrcDataDecoder(mod_l, pp_l.n_sym).window_capacity(),
            MrcDataDecoder(Mod(F.VHT, 7), pp_vht.n_sym).window_capacity(),
            272 + 448 + 160 + 80 * pp_22.n_sym + 160)
    return mpdu, [w_l, w_vht, w_22, w_ndp], branches, w


def _capture(waves, w, dp, sp, seed=3):
    rng = np.random.default_rng(seed)
    max_wave = max(wv.shape[1] for wv in waves)
    t_len = -(-(4 * (max_wave + 900) + 2 * w) // (512 * sp)) * (512 * sp)
    tl = t_len // sp
    cap = np.zeros((dp, 2, t_len), dtype=np.complex64)
    for r in range(dp):
        order = [waves[(r + i) % 4] for i in range(4)]
        offs = [64 + 16 * r, 64 + max_wave + 900,
                (tl - 100) if sp > 1 else (64 + 2 * (max_wave + 900)),
                t_len - max_wave - w]
        for o, wv in zip(offs, order):
            cap[r, :, o:o + wv.shape[1]] += wv
    cap += (rng.standard_normal(cap.shape)
            + 1j * rng.standard_normal(cap.shape)) * 1e-4
    return cap


def _count(out, mpdu):
    ok = np.asarray(out["ok"])
    bits = np.asarray(out["bits"])
    fmt = np.asarray(out["fmt"])
    ndp = np.asarray(out["ndp"])
    psdu_len = np.asarray(out["psdu_len"])
    n_ok = n_ndp = 0
    for r in range(ok.shape[0]):
        for j in range(ok.shape[1]):
            if ndp[r, j]:
                n_ndp += 1
                continue
            if not ok[r, j]:
                continue
            psdu = np.packbits(
                bits[r, j, 16:16 + int(psdu_len[r, j]) * 8].astype(np.uint8),
                bitorder="little").tobytes()
            if fmt[r, j] == 2:
                subs = deaggregate_vht(psdu)
                if subs and subs[0].fcs_ok and subs[0].mpdu == mpdu:
                    n_ok += 1
            elif fcs_ok(psdu) and psdu == mpdu:
                n_ok += 1
    return n_ok, n_ndp


@pytest.mark.parametrize("branch_cap", [None, 8])
def test_dual_chain_sharded_auto(branch_cap):
    mpdu, waves, branches, w = _setup()
    mesh = make_phy_mesh(8, sp=2)
    dp, sp = 4, 2
    cap = _capture(waves, w, dp, sp)
    run = sharded_capture_decode_auto2(mesh, branches, w, k_per_shard=8,
                                       branch_cap=branch_cap)
    out = run(c2r(cap))
    assert not np.any(np.asarray(out["overflow"]))
    assert not np.any(np.asarray(out["branch_overflow"]))
    n_ok, n_ndp = _count(out, mpdu)
    assert n_ok == 3 * dp, f"{n_ok}/{3 * dp} packets"
    assert n_ndp == dp, f"{n_ndp}/{dp} NDPs"


def test_dual_chain_branch_overflow_flags():
    """A branch capacity smaller than its matching-window count must flag
    branch_overflow instead of silently truncating coverage claims."""
    mpdu, waves, branches, w = _setup()
    mesh = make_phy_mesh(8, sp=2)
    cap = _capture(waves, w, 4, 2)
    run = sharded_capture_decode_auto2(mesh, branches, w, k_per_shard=8,
                                       branch_cap=1)
    out = run(c2r(cap))
    assert np.any(np.asarray(out["branch_overflow"]))
