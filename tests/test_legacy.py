"""Legacy-variant parity tests: per-symbol-pilot TX, in-graph TX
(`dev/py/ofdm.py:276-325,384-451`), legacy Rayleigh channels
(`dev/py/radio.py:123-257`), and the norm-toggle AWGN
(`dev/py/radio.py:91-120`).  Oracles are NumPy restatements of the
reference equations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_ofdm_tpu.channel.awgn import awgn_channel_norm
from dl_ofdm_tpu.channel.legacy import (legacy_tap_coeff,
                                        rayleigh_channel_batch_coherent,
                                        rayleigh_channel_legacy)
from dl_ofdm_tpu.config import OFDMConfig
from dl_ofdm_tpu.ofdm.legacy_tx import (legacy_tx_plan,
                                        ofdm_modulate_symbol_pilots,
                                        ofdm_transmitter_iq)
from dl_ofdm_tpu.ofdm.plan import build_plan


def _const_table_np(nbits):
    from dl_ofdm_tpu.ofdm.constellation import _table_np
    return _table_np(nbits)


def _bits_to_syms_np(bits):
    nbits = bits.shape[-1]
    table = _const_table_np(nbits)
    idx = bits.reshape(-1, nbits) @ (1 << np.arange(nbits)[::-1])
    return table[idx]


class TestLegacyTapCoeff:
    def test_etu_reference_equations(self):
        # restated from dev/py/radio.py:214-233 at 0.96 Msps
        coeff = legacy_tap_coeff("ETU", 0.96e6, 560)
        t_ns = 1e9 / 0.96e6
        delay = np.array([0, 50, 120, 200, 230, 500, 1600, 2300, 5000.0])
        pdb = np.array([-1.0, -1, -1, 0, 0, 0, -3, -5, -7])
        c_tap = np.ceil(delay / t_ns).astype(int)
        c_taps, c_idx = np.unique(c_tap, return_index=True)
        c_pow = 10.0 ** (pdb[c_idx] / 10)
        expect = np.zeros(int(np.ceil(delay[-1] / t_ns)) + 1)
        expect[c_taps] = c_pow / np.sqrt(c_pow.sum())
        np.testing.assert_allclose(coeff, expect, rtol=1e-6)
        # the linear-power quirk: weights are powers, not amplitudes
        assert not np.allclose(coeff[coeff > 0],
                               np.sqrt(c_pow) / np.sqrt(c_pow.sum()))

    def test_flat_fallback(self):
        np.testing.assert_array_equal(legacy_tap_coeff("Flat", 1e7, 100),
                                      np.ones(1, np.float32))


class TestLegacyRayleigh:
    def test_per_frame_matches_numpy_convolve(self):
        key = jax.random.PRNGKey(3)
        n_fr, n_sym, n_sc, nfft = 4, 7, 80, 64
        x = np.random.default_rng(0).normal(
            size=(n_fr, n_sym, n_sc, 2)).astype(np.float32)
        y, h_f = rayleigh_channel_legacy(key, jnp.asarray(x), nfft,
                                         chan="ETU", samp_rate=0.96e6)
        # reproduce the tap draws, then apply the reference equations in NumPy
        coeff = legacy_tap_coeff("ETU", 0.96e6, n_sym * n_sc)
        n_fir = len(coeff)
        draws = np.asarray(
            jax.random.normal(key, (n_fr, n_fir, 2), jnp.float32)
        ) / np.sqrt(2.0)
        ht = (draws[..., 0] + 1j * draws[..., 1]) * coeff
        xc = (x[..., 0] + 1j * x[..., 1]).reshape(n_fr, -1)
        for i in range(n_fr):
            yc = np.convolve(xc[i], ht[i], mode="same")
            got = np.asarray(y[i]).reshape(-1, 2)
            np.testing.assert_allclose(got[:, 0], yc.real, atol=2e-4)
            np.testing.assert_allclose(got[:, 1], yc.imag, atol=2e-4)
            hf = np.fft.fft(ht[i], nfft)
            np.testing.assert_allclose(np.asarray(h_f[i, 0, :, 0]), hf.real,
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(h_f[i, 3, :, 1]), hf.imag,
                                       atol=2e-4)

    def test_awgn_passthrough(self):
        x = jnp.ones((2, 7, 80, 2))
        y, h = rayleigh_channel_legacy(jax.random.PRNGKey(0), x, 64, "AWGN")
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(h[..., 0]), 1.0)
        np.testing.assert_array_equal(np.asarray(h[..., 1]), 0.0)

    def test_batch_coherent_tf_same_alignment(self):
        """TF 'SAME' cross-correlation semantics (`dev/py/complex.py:44-45`):
        out[n] = sum_k h[k] x[n - (F-1)//2 + k], one shared kernel."""
        key = jax.random.PRNGKey(7)
        b, s, t = 3, 2, 40
        x = np.random.default_rng(1).normal(size=(b, s, t, 2)).astype(
            np.float32)
        y, _ = rayleigh_channel_batch_coherent(
            key, jnp.asarray(x), jnp.full((b,), 300.0), chan="EPA",
            samp_rate=1e7)
        coeff = legacy_tap_coeff("EPA", 1e7, s * t)
        n_fir = len(coeff)
        kh, _ = jax.random.split(key)
        draws = np.asarray(jax.random.normal(kh, (n_fir, 2), jnp.float32))
        ht = (draws[..., 0] + 1j * draws[..., 1]) / np.sqrt(2.0) * coeff
        xc = (x[..., 0] + 1j * x[..., 1]).reshape(b, -1)
        pad_l = (n_fir - 1) // 2
        for i in range(b):
            xp = np.pad(xc[i], (pad_l, n_fir - 1 - pad_l))
            expect = np.array([np.dot(ht, xp[n:n + n_fir])
                               for n in range(s * t)])
            got = np.asarray(y[i]).reshape(-1, 2)
            np.testing.assert_allclose(got[:, 0], expect.real, atol=1e-4)
            np.testing.assert_allclose(got[:, 1], expect.imag, atol=1e-4)


class TestAWGNNorm:
    def test_batchnorm_moments_and_noise_power(self):
        key = jax.random.PRNGKey(11)
        x = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (4096, 7, 80, 2)) + 2.0
        snr = jnp.full((4096,), 10.0)
        y, npow = awgn_channel_norm(key, x, snr, norm=False)
        level = np.sqrt(0.5) * 10 ** (-10 / 20.0)
        np.testing.assert_allclose(float(npow), 2 * level ** 2, rtol=0.05)
        # post-batchnorm/sqrt(2) moments: mean 0, var 1/2 per component
        assert abs(float(jnp.mean(y))) < 0.02
        np.testing.assert_allclose(float(jnp.var(y)), 0.5 + 2 * level ** 2 / 2,
                                   rtol=0.05)

    def test_norm_toggle_scales_by_rms(self):
        key = jax.random.PRNGKey(12)
        x = jax.random.normal(jax.random.PRNGKey(2), (2048, 7, 80, 2))
        snr = jnp.full((2048,), 0.0)
        _, np_off = awgn_channel_norm(key, x, snr, norm=False)
        _, np_on = awgn_channel_norm(key, x, snr, norm=True)
        # post-norm RMS amplitude is ~1 (two components of var 1/2), so the
        # toggle multiplies noise power by ~1; verify both match closed form
        np.testing.assert_allclose(float(np_off), 1.0, rtol=0.05)
        np.testing.assert_allclose(float(np_on), 1.0, rtol=0.05)


class TestSymbolPilotTx:
    def test_matches_numpy_oracle(self):
        cfg = OFDMConfig(nbits=2)
        plan = build_plan(cfg)
        n_sym = 2 * plan.nsymbol
        n_data = len(plan.data_carriers)
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, (n_sym, n_data, 2)).astype(np.int32)

        iq, pilot_iq = ofdm_modulate_symbol_pilots(jnp.asarray(bits), plan)
        # NumPy restatement of dev/py/ofdm.py:294-322
        syms = _bits_to_syms_np(bits).reshape(n_sym, n_data)
        grid = np.zeros((n_sym, plan.nfft), np.complex64)
        grid[:, plan.data_carriers] = syms
        grid[:, plan.pilot_carriers] = plan.pilot_value
        td = np.fft.ifft(grid)
        wf = np.concatenate([td[:, -plan.cp_len:], td], axis=1)
        wf = wf.reshape(-1, plan.nsymbol, plan.samples_per_symbol)
        got = np.asarray(iq)
        np.testing.assert_allclose(got[..., 0], wf.real, atol=2e-5)
        np.testing.assert_allclose(got[..., 1], wf.imag, atol=2e-5)
        expect_pilot = np.stack([wf.real, wf.imag],
                                -1)[:, :, plan.pilot_carriers, :]
        np.testing.assert_allclose(np.asarray(pilot_iq), expect_pilot,
                                   atol=2e-5)

    def test_shape_validation(self):
        plan = build_plan(OFDMConfig(nbits=1))
        with pytest.raises(ValueError):
            ofdm_modulate_symbol_pilots(jnp.zeros((7, 3, 1), jnp.int32), plan)


class TestLegacyInGraphTx:
    def test_plan_reference_values(self):
        # dev/py/ofdm.py:391-407 at K=64, P=8, G=8
        plan = legacy_tx_plan(64, 8, 8)
        assert plan.cp_len == 16
        np.testing.assert_array_equal(plan.pilot_carriers,
                                      np.arange(4, 60, 8))
        assert len(plan.data_carriers) == 49
        # positional-delete quirk: pilots removed by POSITION index
        effec = np.arange(4, 60)
        np.testing.assert_array_equal(
            plan.data_carriers, np.delete(effec, plan.pilot_carriers - 4))
        # no DC null in the legacy plan
        assert 31 in plan.data_carriers or 32 in plan.data_carriers

    def test_matches_numpy_oracle(self):
        plan = legacy_tx_plan(64, 8, 8)
        b, n_sym, nbits = 3, 4, 2
        rng = np.random.default_rng(9)
        bits = rng.integers(0, 2, (b, n_sym, len(plan.data_carriers),
                                   nbits)).astype(np.int32)
        iq, pilot_iq = ofdm_transmitter_iq(jnp.asarray(bits), 64, 8, 8)
        syms = _bits_to_syms_np(bits).reshape(b * n_sym, -1)
        grid = np.zeros((b * n_sym, 64), np.complex64)
        grid[:, plan.data_carriers] = syms
        grid[:, plan.pilot_carriers] = 3 + 3j
        td = np.fft.ifft(grid)
        wf = np.concatenate([td[:, -16:], td], axis=1).reshape(b, n_sym, 80)
        got = np.asarray(iq)
        np.testing.assert_allclose(got[..., 0], wf.real, atol=2e-5)
        np.testing.assert_allclose(got[..., 1], wf.imag, atol=2e-5)
        # the reversed pilot-slice quirk iq[:, :, CP:K//P:-1, :]
        expect = np.stack([wf.real, wf.imag], -1)[:, :, 16:8:-1, :]
        np.testing.assert_allclose(np.asarray(pilot_iq), expect, atol=2e-5)
