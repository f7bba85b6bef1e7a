"""Batched JAX TX equals the golden numpy TX sample-for-sample."""
import numpy as np
import jax.numpy as jnp
import pytest

from ieee80211_tpu.mac import MacConfig, aggregate_vht, build_udp_mpdu
from ieee80211_tpu.specs import BW, F, Mod
from ieee80211_tpu.specs.modulation import (ppdu_params_aggregate,
                                            ppdu_params_nonaggregate)
from ieee80211_tpu.tx import gen_ampdu, gen_mpdu
from ieee80211_tpu.tx.jax_tx import TxPipeline

MAC_CFG = MacConfig(addr1="f4:69:d5:80:0f:a0", addr2="00:c0:ca:b1:5b:e1",
                    addr3="f4:69:d5:80:0f:a0", seq=2704)
MAC_CFG_QOS = MacConfig(subtype=8, addr1="f4:69:d5:80:0f:a0",
                        addr2="00:c0:ca:b1:5b:e1",
                        addr3="f4:69:d5:80:0f:a0", seq=2704)


def _as_c(w2):
    return w2[..., 0] + 1j * w2[..., 1]


@pytest.mark.parametrize("fmt,mcs,nsts", [
    (F.L, 0, 1), (F.L, 7, 1), (F.HT, 7, 1), (F.HT, 12, 2)])
def test_jax_tx_matches_golden_mpdu(fmt, mcs, nsts):
    mpdu = build_udp_mpdu(b"123456789012345678901234567890", MAC_CFG)
    mod = Mod(fmt, mcs, BW.BW20, nsts)
    want = gen_mpdu(mpdu, mod).waveform
    pp = ppdu_params_nonaggregate(mod, len(mpdu))
    pipe = TxPipeline(mod, pp)
    got = np.asarray(pipe.step(jnp.asarray(
        np.tile(np.frombuffer(mpdu, np.uint8), (3, 1)))))
    assert got.shape == (3, mod.nSS, want.shape[-1], 2)
    np.testing.assert_allclose(_as_c(got[0]), want, atol=2e-6)
    np.testing.assert_allclose(_as_c(got[2]), want, atol=2e-6)


@pytest.mark.parametrize("mcs,nsts", [(0, 1), (8, 1), (7, 2)])
def test_jax_tx_matches_golden_vht(mcs, nsts):
    ampdu = aggregate_vht([build_udp_mpdu(b"123456789012345678901234567890",
                                          MAC_CFG_QOS)])
    mod = Mod(F.VHT, mcs, BW.BW20, nsts)
    want = gen_ampdu(ampdu, mod).waveform
    pp = ppdu_params_aggregate(mod, len(ampdu))
    pipe = TxPipeline(mod, pp)
    got = np.asarray(pipe.step(jnp.asarray(
        np.frombuffer(ampdu, np.uint8)[None])))
    np.testing.assert_allclose(_as_c(got[0]), want, atol=2e-6)
