"""Channel subsystem: FIR alignment vs np.convolve oracle, alpha-matrix parity
vs the reference CSVs, AWGN statistics, Rayleigh/Doppler golden equations
(`/root/reference/dev/py/radio.py`)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_ofdm_tpu.channel import fir
from dl_ofdm_tpu.channel.awgn import awgn_channel
from dl_ofdm_tpu.channel.doppler import SS, jakes_gains
from dl_ofdm_tpu.channel.profiles import alpha_matrix, get_profile
from dl_ofdm_tpu.channel.rayleigh import RayleighChannel

REF_CSV_DIR = "/root/reference/dev/py/3gpp"


# ---------------------------------------------------------------- profiles --
@pytest.mark.parametrize("name,shape", [
    ("etu", (9, 13)), ("epa", (7, 9)), ("eva", (9, 11)), ("custom", (8, 12))])
def test_alpha_matrix_matches_reference_csv(name, shape):
    p = get_profile(name)
    assert p.alpha_matrix.shape == shape
    csv = os.path.join(REF_CSV_DIR, f"AM_{name.upper() if name != 'custom' else 'Custom'}.csv")
    if not os.path.exists(csv):
        pytest.skip("reference CSVs not mounted")
    ref = np.genfromtxt(csv, delimiter=",")
    np.testing.assert_allclose(p.alpha_matrix, ref, atol=1e-5)


def test_reference_tap_weighting():
    """ch_coeff = p_lin / sqrt(sum p_lin) (`radio.py:367-371`)."""
    p = get_profile("etu")
    plin = 10.0 ** (np.asarray(
        [-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, -3.0, -5.0, -7.0]) / 10.0)
    np.testing.assert_allclose(p.ch_coeff, plin / np.sqrt(plin.sum()), rtol=1e-12)
    phys = get_profile("etu", weighting="physical")
    np.testing.assert_allclose(np.sum(phys.ch_coeff**2), 1.0, rtol=1e-12)


def test_alpha_matrix_delta_for_integer_delays():
    am = alpha_matrix(np.array([0.0]), 0.96e6, n_cols=9)
    want = np.zeros(9); want[4] = 1.0
    np.testing.assert_allclose(am[0], want, atol=1e-12)


# --------------------------------------------------------------------- FIR --
def test_fir_same_batched_matches_np_convolve(rng):
    x = (rng.normal(size=(5, 97)) + 1j * rng.normal(size=(5, 97))).astype(np.complex64)
    h = (rng.normal(size=(5, 13)) + 1j * rng.normal(size=(5, 13))).astype(np.complex64)
    got = np.asarray(fir.fir_same_batched(jnp.asarray(x), jnp.asarray(h), (13 - 1) // 2))
    for i in range(5):
        want = np.convolve(x[i], h[i], mode="same")
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_fir_same_varlen_per_row_alignment(rng):
    """Rows with different true kernel lengths (zero-padded) must match each
    row's own np.convolve 'same' alignment."""
    lens = [13, 9, 11, 1]
    fmax = max(lens)
    x = (rng.normal(size=(4, 80)) + 1j * rng.normal(size=(4, 80))).astype(np.complex64)
    h = np.zeros((4, fmax), np.complex64)
    for i, L in enumerate(lens):
        h[i, :L] = rng.normal(size=L) + 1j * rng.normal(size=L)
    off = jnp.asarray([(L - 1) // 2 for L in lens], jnp.int32)
    got = np.asarray(fir.fir_same_varlen(jnp.asarray(x), jnp.asarray(h), off))
    for i, L in enumerate(lens):
        want = np.convolve(x[i], h[i, :L], mode="same")
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_fir_per_symbol_matches_reference_loop(rng):
    """Oracle: the reference Doppler convolution loop (`radio.py:399-421`)."""
    b, s, n_sc, n_taps, n_fir = 3, 7, 80, 9, 13
    tx = (rng.normal(size=(b, s, n_sc)) + 1j * rng.normal(size=(b, s, n_sc))
          ).astype(np.complex64)
    h = (rng.normal(size=(b, s, n_fir)) + 1j * rng.normal(size=(b, s, n_fir))
         ).astype(np.complex64)
    got = np.asarray(fir.fir_per_symbol(
        jnp.asarray(tx), jnp.asarray(h), n_taps, (n_fir - 1) // 2))
    for ib in range(b):
        flat = tx[ib].reshape(-1)
        pre = np.zeros(n_taps + s * n_sc, np.complex64)
        pre[n_taps:] = flat
        out = np.zeros_like(flat)
        for i in range(s):
            window = pre[n_sc * i: n_taps + n_sc * (i + 1)]
            roll = np.convolve(window, h[ib, i], mode="same")
            out[n_sc * i: n_sc * (i + 1)] = roll[n_taps:]
        np.testing.assert_allclose(got[ib].reshape(-1), out, atol=1e-4)


# -------------------------------------------------------------------- AWGN --
def test_awgn_noise_power_and_normalization():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((64, 7, 80, 2)) * 3.0
    snr = jnp.full((64,), 10.0)
    y, noise_pwr = awgn_channel(key, x, snr)
    # expected per-component noise var: 0.5 * 10^(-snr/10)
    want = 10 ** (-10.0 / 10.0)
    assert float(noise_pwr) == pytest.approx(want, rel=0.05)
    # signal normalized to unit mean complex power before noise
    sig = y - x * jax.lax.rsqrt(jnp.mean(jnp.sum(x**2, -1)))
    assert float(jnp.mean(jnp.sum(sig**2, -1))) == pytest.approx(want, rel=0.05)


# ---------------------------------------------------------------- Rayleigh --
def test_awgn_channel_passthrough():
    chan = RayleighChannel("awgn", nfft=64)
    key = jax.random.PRNGKey(1)
    tx = (jnp.ones((4, 7, 80)) * (1 + 1j)).astype(jnp.complex64)
    out = chan.apply_complex(key, tx)
    np.testing.assert_allclose(np.asarray(out.y), np.asarray(tx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.h_freq), 1.0, atol=1e-6)


def test_static_rayleigh_ht_is_fft_of_kernel(rng):
    """h_freq must equal fft(gt, nfft) for the same realization; verify via
    the frequency response actually applied to a pure-tone frame."""
    chan = RayleighChannel("etu", nfft=64)
    key = jax.random.PRNGKey(2)
    b, s, n_sc = 8, 7, 80
    tx = (rng.normal(size=(b, s, n_sc)) + 1j * rng.normal(size=(b, s, n_sc))
          ).astype(np.complex64)
    out = chan.apply_complex(key, jnp.asarray(tx))
    y = np.asarray(out.y)
    h = np.asarray(out.h_freq)
    # reconstruct kernel from h_freq and check convolution equality
    p = get_profile("etu")
    gt = np.fft.ifft(h[:, 0, :], axis=-1)[:, : p.n_fir]
    for i in range(b):
        want = np.convolve(tx[i].reshape(-1), gt[i], mode="same")
        np.testing.assert_allclose(y[i].reshape(-1), want, atol=2e-3)
    # static channel: same H for all symbols
    np.testing.assert_allclose(h[:, 1:, :], h[:, :1, :].repeat(s - 1, 1),
                               atol=1e-6)


def test_rayleigh_tap_statistics():
    """Mean realized tap power follows the (reference-quirk) ch_coeff^2."""
    chan = RayleighChannel("epa", nfft=64)
    p = get_profile("epa")
    keys = jax.random.split(jax.random.PRNGKey(3), 1)
    tx = jnp.zeros((4096, 1, 80), jnp.complex64).at[:, :, 0].set(1.0)
    out = chan.apply_complex(keys[0], tx)
    # mean |H|^2 over frames == sum over taps of coeff^2 (flat PDP in freq)
    mean_pow = float(jnp.mean(jnp.abs(out.h_freq) ** 2))
    want = float(np.sum(p.ch_coeff**2))
    assert mean_pow == pytest.approx(want, rel=0.1)


def test_mix_rayleigh_profile_cycling():
    chan = RayleighChannel("mixRayleigh", nfft=64)
    assert [p.name for p in chan.profiles] == ["flat", "etu", "eva", "epa"]
    idx = chan._frame_profiles(8)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3, 0, 1, 2, 3])


def test_mix_all_has_awgn_passthrough_frames():
    chan = RayleighChannel("mixAll", nfft=64)
    key = jax.random.PRNGKey(4)
    tx = (jnp.ones((10, 7, 80)) * (1 - 2j)).astype(jnp.complex64)
    out = chan.apply_complex(key, tx)
    y = np.asarray(out.y)
    for i in (0, 5):  # every 5th frame is AWGN passthrough
        np.testing.assert_allclose(y[i], np.asarray(tx[i]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.h_freq)[i], 1.0, atol=1e-5)


# ----------------------------------------------------------------- Doppler --
def test_jakes_gains_match_reference_equations(rng):
    """Oracle: `doppler_realize`/`doppler_channel` zck equations
    (`radio.py:387-414`) with the same phases."""
    fd, n_taps, s = 70.0, 9, 7
    key = jax.random.PRNGKey(5)
    t = jnp.arange(s, dtype=jnp.float32) * (80 / 0.96e6)
    z = np.asarray(jakes_gains(key, jnp.asarray([fd]), t, n_taps))[0]
    # recompute with the same uniform draws
    kr, ki = jax.random.split(key)
    th_re = np.asarray(jax.random.uniform(
        kr, (1, SS, n_taps), minval=0.0, maxval=2 * np.pi))[0]
    th_im = np.asarray(jax.random.uniform(
        ki, (1, SS, n_taps), minval=0.0, maxval=2 * np.pi))[0]
    k_vec = np.arange(1, n_taps + 1)
    n_vec = (np.arange(1, SS + 1).reshape(SS, 1) - 0.5) * np.pi / (4 * SS)
    f_re = fd * np.cos(n_vec + k_vec * np.pi / (4 * SS))
    f_im = fd * np.cos(n_vec - k_vec * np.pi / (4 * SS))
    c1 = np.sqrt(1 / SS)
    for i in range(s):
        var_t = float(t[i])
        mu_re = c1 * np.sum(np.cos(2 * np.pi * var_t * f_re + th_re), 0)
        mu_im = c1 * np.sum(np.cos(2 * np.pi * var_t * f_im + th_im), 0)
        np.testing.assert_allclose(z[i], mu_re + 1j * mu_im, atol=1e-4)


def test_mobile_single_channel_uses_doppler():
    chan = RayleighChannel("etu", nfft=64, mobile=True)
    assert chan.has_doppler
    key = jax.random.PRNGKey(6)
    tx = (jnp.ones((2, 7, 80))).astype(jnp.complex64)
    out = chan.apply_complex(key, tx)
    h = np.asarray(out.h_freq)
    # time-varying channel: H differs across symbols
    assert np.abs(h[:, 0, :] - h[:, 3, :]).max() > 1e-4


# ------------------------------------------------- real-pair (TPU) path ----
def _iq(x):
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def test_fir_same_iq_matches_np_convolve(rng):
    lens = [13, 9, 11, 1]
    fmax = max(lens)
    x = (rng.normal(size=(4, 80)) + 1j * rng.normal(size=(4, 80))).astype(np.complex64)
    h = np.zeros((4, fmax), np.complex64)
    for i, L in enumerate(lens):
        h[i, :L] = rng.normal(size=L) + 1j * rng.normal(size=L)
    off = np.asarray([(L - 1) // 2 for L in lens])
    got = np.asarray(fir.fir_same_iq(jnp.asarray(_iq(x)), jnp.asarray(_iq(h)), off))
    for i, L in enumerate(lens):
        want = np.convolve(x[i], h[i, :L], mode="same")
        np.testing.assert_allclose(got[i, :, 0] + 1j * got[i, :, 1], want,
                                   atol=1e-4)


def test_fir_per_symbol_iq_matches_reference_loop(rng):
    b, s, n_sc, n_taps, n_fir = 3, 7, 80, 9, 13
    tx = (rng.normal(size=(b, s, n_sc)) + 1j * rng.normal(size=(b, s, n_sc))
          ).astype(np.complex64)
    h = (rng.normal(size=(b, s, n_fir)) + 1j * rng.normal(size=(b, s, n_fir))
         ).astype(np.complex64)
    off = np.full((b,), (n_fir - 1) // 2)
    got = np.asarray(fir.fir_per_symbol_iq(
        jnp.asarray(_iq(tx)), jnp.asarray(_iq(h)), n_taps, off))
    for ib in range(b):
        flat = tx[ib].reshape(-1)
        pre = np.zeros(n_taps + s * n_sc, np.complex64)
        pre[n_taps:] = flat
        out = np.zeros_like(flat)
        for i in range(s):
            window = pre[n_sc * i: n_taps + n_sc * (i + 1)]
            roll = np.convolve(window, h[ib, i], mode="same")
            out[n_sc * i: n_sc * (i + 1)] = roll[n_taps:]
        gc = got[ib].reshape(-1, 2)
        np.testing.assert_allclose(gc[:, 0] + 1j * gc[:, 1], out, atol=1e-4)


def test_dft_idft_iq_match_numpy_fft(rng):
    from dl_ofdm_tpu.ops import cfloat
    x = (rng.normal(size=(5, 13)) + 1j * rng.normal(size=(5, 13))).astype(np.complex64)
    got = np.asarray(cfloat.dft_iq(jnp.asarray(_iq(x)), 64))
    want = np.fft.fft(x, n=64, axis=-1)
    np.testing.assert_allclose(got[..., 0] + 1j * got[..., 1], want, atol=1e-4)
    y = (rng.normal(size=(5, 64)) + 1j * rng.normal(size=(5, 64))).astype(np.complex64)
    got = np.asarray(cfloat.idft_iq(jnp.asarray(_iq(y))))
    want = np.fft.ifft(y, axis=-1)
    np.testing.assert_allclose(got[..., 0] + 1j * got[..., 1], want, atol=1e-5)


def test_mix_doppler_partitioned_fir_matches_general_path():
    """The mixRayleigh-mobile fast path (static batch partition: per-symbol
    FIR only on every-3rd Doppler frames) is bitwise-identical to the
    general where-merged path."""
    import jax
    import jax.numpy as jnp
    from dl_ofdm_tpu.channel.rayleigh import RayleighChannel

    ch = RayleighChannel("mixRayleigh", nfft=64, mobile=True, mix=True)
    key = jax.random.PRNGKey(3)
    tx = jax.random.normal(jax.random.PRNGKey(4), (12, 7, 80, 2), jnp.float32)
    ch._partition_doppler = True
    out_fast = ch(key, tx)
    ch._partition_doppler = False
    out_gen = ch(key, tx)
    np.testing.assert_array_equal(np.asarray(out_fast.y),
                                  np.asarray(out_gen.y))
    np.testing.assert_array_equal(np.asarray(out_fast.h_freq),
                                  np.asarray(out_gen.h_freq))
    # non-divisible batches fall back to the general path and still work
    tx13 = jax.random.normal(jax.random.PRNGKey(5), (13, 7, 80, 2))
    ch._partition_doppler = True
    out13 = ch(key, tx13.astype(jnp.float32))
    assert np.isfinite(np.asarray(out13.y)).all()
