"""2x2 SU-MIMO RX at 40/80 MHz: golden TX -> MimoReceiver at the matching
rate, bit-exact through a random mixing channel.

BEYOND the reference envelope twice over: its RX rejects 40 MHz
(signalCheckHt, /root/reference/lib/cloud80211phy.cc:744-748) and its
2x2 chain (demod2) is 20 MHz-only; here the same wideband geometry that
carries SISO 40/80 MHz (tests/test_wideband_rx.py) also carries the
P-matrix MIMO channel estimate, ZF equalizer and stream deparser.
"""
import numpy as np
import pytest

from ieee80211_tpu.mac import MacConfig, aggregate_vht, build_udp_mpdu
from ieee80211_tpu.rx.mimo import MimoReceiver
from ieee80211_tpu.specs import BW, F, Mod
from ieee80211_tpu.tx import finalize, gen_ampdu, gen_mpdu

CFG = MacConfig(addr1="f4:69:d5:80:0f:a0", addr2="00:c0:ca:b1:5b:e1",
                addr3="f4:69:d5:80:0f:a0", seq=2704)
CFG_QOS = MacConfig(subtype=8, addr1="f4:69:d5:80:0f:a0",
                    addr2="00:c0:ca:b1:5b:e1", addr3="f4:69:d5:80:0f:a0",
                    seq=2704)
PAYLOAD = b"wideband 2x2 MIMO beyond the reference envelope!"
Q = {BW.BW20: 1, BW.BW40: 2, BW.BW80: 4}


def _mix(wave: np.ndarray, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    h = (rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2)))
    h = h + 2.5 * np.eye(2)
    out = h @ wave
    out += (rng.standard_normal(out.shape)
            + 1j * rng.standard_normal(out.shape)) * 1e-4
    return out


@pytest.mark.parametrize("mcs,bw", [(8, BW.BW40), (12, BW.BW40),
                                    (15, BW.BW40)])
def test_ht_2x2_wideband(mcs, bw):
    q = Q[bw]
    mpdu = build_udp_mpdu(PAYLOAD, CFG)
    tx = gen_mpdu(mpdu, Mod(F.HT, mcs, bw, 2))
    cap = finalize(tx.waveform, multiplier=0.2, cfo_hz=9000.0 * q, num=1,
                   gap=True, gap_len=400 * q)
    cap = _mix(cap, seed=mcs)
    res = MimoReceiver(sample_rate_hz=20e6 * q).decode_capture(cap)
    assert len(res) == 1
    assert res[0].fmt == F.HT and res[0].mcs == mcs
    assert res[0].fcs_ok and res[0].mpdus[0] == mpdu


@pytest.mark.parametrize("mcs,bw", [(0, BW.BW40), (5, BW.BW40),
                                    (9, BW.BW40), (0, BW.BW80),
                                    (7, BW.BW80), (9, BW.BW80)])
def test_vht_2x2_wideband(mcs, bw):
    q = Q[bw]
    mpdu = build_udp_mpdu(PAYLOAD, CFG_QOS)
    tx = gen_ampdu(aggregate_vht([mpdu]), Mod(F.VHT, mcs, bw, 2))
    cap = finalize(tx.waveform, multiplier=0.2, cfo_hz=-7000.0 * q, num=1,
                   gap=True, gap_len=400 * q)
    cap = _mix(cap, seed=10 * mcs + q)
    res = MimoReceiver(sample_rate_hz=20e6 * q).decode_capture(cap)
    assert len(res) == 1
    assert res[0].fmt == F.VHT and res[0].mcs == mcs
    assert res[0].fcs_ok and res[0].mpdus[0] == mpdu
