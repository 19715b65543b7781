"""Validate the fused-synthesize math (ops/fused_synth.py) off-TPU.

The Pallas kernels and the jnp emulator share the same helper functions
(`_tx_waveform`, `_fir_same`, `_tap_kernel`, `_combine_stats`, ...); these
tests pin every helper to the framework's reference implementations, so the
only hardware-only residue is the pltpu PRNG plumbing (validated on the chip
by scripts/fused_synth_check.py — the Mosaic PRNG returns zeros under the
Pallas interpreter, so it cannot be exercised here).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_ofdm_tpu.config import OFDMConfig
from dl_ofdm_tpu.channel.profiles import get_profile
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames_iq
from dl_ofdm_tpu.ops import fused_synth as fs


@pytest.fixture(scope="module")
def etu_spec():
    plan = build_plan(OFDMConfig(nbits=1))
    return fs.build_synth_spec(plan, get_profile("etu"), nbits=1), plan


def test_tx_waveform_matches_modulator(etu_spec):
    """The fused chain's per-symbol GEMM TX must equal the production
    modulator on identical bits (all modulations)."""
    for nbits in (1, 2, 4):
        plan = build_plan(OFDMConfig(nbits=nbits))
        spec = fs.build_synth_spec(plan, None, nbits=nbits)
        key = jax.random.PRNGKey(0)
        idx = jax.random.randint(key, (6, plan.frame_size), 0, 2 ** nbits)
        bits = fs._bits_from_idx(idx, nbits)
        sym_r, sym_i = fs._symbols_from_idx(idx.astype(jnp.float32), spec)
        x_r, x_i = fs._tx_waveform(
            sym_r, sym_i, jnp.asarray(spec.w_r), jnp.asarray(spec.w_i),
            jnp.asarray(spec.bias_r), jnp.asarray(spec.bias_i), spec)
        want = np.asarray(ofdm_modulate_frames_iq(bits, plan, fused="symbol"))
        got_r = np.asarray(x_r).reshape(6, plan.nsymbol, plan.samples_per_symbol)
        got_i = np.asarray(x_i).reshape(6, plan.nsymbol, plan.samples_per_symbol)
        np.testing.assert_allclose(got_r, want[..., 0], atol=2e-5)
        np.testing.assert_allclose(got_i, want[..., 1], atol=2e-5)


def test_fir_same_matches_channel_fir(etu_spec):
    """_fir_same must equal channel.fir.fir_same_iq (np.convolve 'same')."""
    from dl_ofdm_tpu.channel import fir
    spec, plan = etu_spec
    key = jax.random.PRNGKey(1)
    b, l = 5, spec.length
    x = jax.random.normal(key, (b, l, 2))
    h = jax.random.normal(jax.random.fold_in(key, 1), (b, spec.fir_u, 2))
    want = np.asarray(fir.fir_same_iq(
        x, h, np.full(b, spec.off_u, np.int32)))
    got_r, got_i = fs._fir_same(x[..., 0], x[..., 1],
                                h[..., 0], h[..., 1], spec)
    np.testing.assert_allclose(np.asarray(got_r), want[..., 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_i), want[..., 1], atol=1e-4)


def test_tap_gt_matches_rayleigh_gt(etu_spec):
    """gt = (zck*coeff) @ alpha (+ passthrough bias), per-row, vs the
    channel's einsum (single-profile spec: no pre-shift)."""
    spec, _ = etu_spec
    prof = get_profile("etu")
    key = jax.random.PRNGKey(2)
    b = 4
    zck = jax.random.normal(key, (b, prof.n_taps, 2)) / np.sqrt(2)
    coeff = jnp.asarray(prof.ch_coeff)
    alpha = jnp.asarray(prof.alpha_matrix)
    want = jnp.einsum("btc,btf->bfc", zck * coeff[None, :, None],
                      jnp.broadcast_to(alpha, (b,) + alpha.shape))
    rows = np.zeros(b, np.int32)
    got_r, got_i = fs._tap_gt(zck[..., 0], zck[..., 1],
                              jnp.asarray(spec.coeff_cls[rows]),
                              jnp.asarray(spec.alpha_cls[rows]),
                              jnp.asarray(spec.gbias_cls[rows]), spec)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want[..., 0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want[..., 1]),
                               atol=1e-5)


def test_mixed_spec_prealigned_fir_matches_per_profile_convolve():
    """mixRayleigh spec: the unified pre-shifted kernels convolved at the
    common offset must equal each profile's np.convolve(..., 'same') with
    its own alignment (`dev/py/radio.py:450-467` per-frame profile cycle)."""
    plan = build_plan(OFDMConfig(nbits=1))
    names = ["flat", "etu", "eva", "epa"]
    profs = [get_profile(n) for n in names]
    spec = fs.build_synth_spec(plan, profs, nbits=1)
    assert spec.n_classes == 4 and spec.block % 4 == 0
    key = jax.random.PRNGKey(3)
    b = 8  # two full cycles
    rows = np.arange(b) % 4
    x = jax.random.normal(key, (b, spec.length, 2))
    zck = jax.random.normal(jax.random.fold_in(key, 1),
                            (b, spec.taps, 2)) / np.sqrt(2)
    gt_r, gt_i = fs._tap_gt(zck[..., 0], zck[..., 1],
                            jnp.asarray(spec.coeff_cls[rows]),
                            jnp.asarray(spec.alpha_cls[rows]),
                            jnp.asarray(spec.gbias_cls[rows]), spec)
    got_r, got_i = fs._fir_same(x[..., 0], x[..., 1], gt_r, gt_i, spec)
    for i in range(b):
        p = profs[rows[i]]
        z = np.asarray(zck[i, :p.n_taps, 0] + 1j * zck[i, :p.n_taps, 1])
        gt = (z * p.ch_coeff) @ p.alpha_matrix
        xs = np.asarray(x[i, :, 0] + 1j * x[i, :, 1])
        want = np.convolve(xs, gt, mode="same")
        np.testing.assert_allclose(np.asarray(got_r[i]), want.real,
                                   atol=2e-4, err_msg=names[rows[i]])
        np.testing.assert_allclose(np.asarray(got_i[i]), want.imag,
                                   atol=2e-4, err_msg=names[rows[i]])


def test_mixed_spec_ground_truth_h_matches_fft():
    """_tap_h's per-row DFT basis must equal fft(gt, nfft), incl. the
    mixAll AWGN-passthrough rows (H = 1)."""
    plan = build_plan(OFDMConfig(nbits=1))
    names = [None, "flat", "etu", "eva", "epa"]   # mixAll cycle
    profs = [None if n is None else get_profile(n) for n in names]
    spec = fs.build_synth_spec(plan, profs, nbits=1)
    assert spec.n_classes == 5 and spec.block % 5 == 0
    key = jax.random.PRNGKey(4)
    b = 10
    rows = np.arange(b) % 5
    zck = jax.random.normal(key, (b, spec.taps, 2)) / np.sqrt(2)
    h_r, h_i = fs._tap_h(zck[..., 0], zck[..., 1],
                         jnp.asarray(spec.coeff_cls[rows]),
                         jnp.asarray(spec.hb_r[rows]),
                         jnp.asarray(spec.hb_i[rows]),
                         jnp.asarray(spec.hbias_cls[rows]), spec)
    for i in range(b):
        p = profs[rows[i]]
        if p is None:
            want = np.ones(plan.nfft, np.complex64)
        else:
            z = np.asarray(zck[i, :p.n_taps, 0] + 1j * zck[i, :p.n_taps, 1])
            gt = (z * p.ch_coeff) @ p.alpha_matrix
            want = np.fft.fft(gt, plan.nfft)
        np.testing.assert_allclose(np.asarray(h_r[i]), want.real, atol=2e-4)
        np.testing.assert_allclose(np.asarray(h_i[i]), want.imag, atol=2e-4)


def test_mixed_passthrough_rows_keep_signal():
    """mixAll row class 0 (AWGN) must pass the waveform through unchanged."""
    plan = build_plan(OFDMConfig(nbits=1))
    profs = [None, get_profile("etu")]
    spec = fs.build_synth_spec(plan, profs, nbits=1)
    key = jax.random.PRNGKey(5)
    b = 4
    rows = np.arange(b) % 2
    x = jax.random.normal(key, (b, spec.length, 2))
    zck = jax.random.normal(jax.random.fold_in(key, 1),
                            (b, spec.taps, 2))
    gt_r, gt_i = fs._tap_gt(zck[..., 0], zck[..., 1],
                            jnp.asarray(spec.coeff_cls[rows]),
                            jnp.asarray(spec.alpha_cls[rows]),
                            jnp.asarray(spec.gbias_cls[rows]), spec)
    got_r, got_i = fs._fir_same(x[..., 0], x[..., 1], gt_r, gt_i, spec)
    for i in (0, 2):
        np.testing.assert_allclose(np.asarray(got_r[i]),
                                   np.asarray(x[i, :, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_i[i]),
                                   np.asarray(x[i, :, 1]), atol=1e-6)


def test_normalization_algebra_matches_awgn_plus_batchnorm(etu_spec):
    """_combine_stats' fold of AWGN-normalize + batch-norm into per-position
    affine coefficients must reproduce awgn_channel + batch_norm_ref exactly,
    given the same signal and noise realizations."""
    from dl_ofdm_tpu.ops.norms import batch_norm_ref
    spec, plan = etu_spec
    key = jax.random.PRNGKey(3)
    b = 64
    snr = jnp.linspace(-5.0, 25.0, b)
    bits, rx, npow, (y_r, y_i, n_r, n_i) = fs.emulate_fused_synthesize(
        spec, b, key, snr, debug=True)
    # reference computation on the SAME realizations
    y_iq = jnp.stack([y_r, y_i], -1).reshape(b, plan.nsymbol, -1, 2)
    n_iq = jnp.stack([n_r, n_i], -1).reshape(b, plan.nsymbol, -1, 2)
    sig_pwr = jnp.mean(y_iq[..., 0] ** 2 + y_iq[..., 1] ** 2)
    y2 = y_iq * jax.lax.rsqrt(sig_pwr) + n_iq            # awgn_channel core
    want = batch_norm_ref(y2)
    np.testing.assert_allclose(np.asarray(rx), np.asarray(want),
                               atol=2e-4, rtol=1e-3)
    want_npow = jnp.mean(n_iq[..., 0] ** 2 + n_iq[..., 1] ** 2)
    np.testing.assert_allclose(float(npow), float(want_npow), rtol=1e-5)


def test_emulator_statistics_match_jnp_chain():
    """Distributional parity with the production jnp synthesize chain:
    identical normalized-output moments and bit uniformity (different PRNG
    streams, so moments compare within Monte-Carlo tolerance)."""
    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.train.loop import Trainer

    cfg = OFDMConfig(nbits=1)
    tr = Trainer(cfg, TrainConfig(batch_size=7 * 512), channel="ETU")
    b = tr.batch_frames
    key = jax.random.PRNGKey(4)
    snr = jnp.full((b,), 5.0)
    bits_j, rx_j, _, npow_j, _ = tr.synthesize(key, b, snr)
    spec = fs.build_synth_spec(tr.plan, get_profile("etu"), nbits=1)
    bits_f, rx_f, npow_f = fs.emulate_fused_synthesize(spec, b, key, snr)
    assert rx_f.shape == rx_j.shape
    assert bits_f.shape == bits_j.shape
    # batch-norm forces per-position mean 0 / var 1/2 in both paths; compare
    # third moments + means as a distribution check, and the noise power.
    np.testing.assert_allclose(float(jnp.mean(rx_f)), float(jnp.mean(rx_j)),
                               atol=1e-3)
    np.testing.assert_allclose(float(jnp.var(rx_f)), float(jnp.var(rx_j)),
                               atol=5e-3)
    np.testing.assert_allclose(float(npow_f), float(npow_j), rtol=0.05)
    assert abs(float(jnp.mean(bits_f)) - 0.5) < 0.01


def test_awgn_passthrough_spec():
    """AWGN spec (no FIR): rx distribution matches the fading-free chain."""
    plan = build_plan(OFDMConfig(nbits=2))
    spec = fs.build_synth_spec(plan, None, nbits=2)
    assert not spec.do_fir
    key = jax.random.PRNGKey(5)
    b = 128
    snr = jnp.full((b,), 10.0)
    bits, rx, npow = fs.emulate_fused_synthesize(spec, b, key, snr)
    assert rx.shape == (b, plan.nsymbol, plan.samples_per_symbol, 2)
    # expected noise power for snr=10: 2 * 0.5 * 10^(-1) = 0.1 (both planes)
    np.testing.assert_allclose(float(npow), 0.1, rtol=0.05)


def test_trainer_uses_fused_synth_only_when_eligible():
    """Trainer wiring: the fused path covers static profiles, mixes and
    Doppler; off-TPU (and over the VMEM size gate) stays on the jnp path."""
    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.train.loop import Trainer

    cfg = OFDMConfig(nbits=1)
    t1 = Trainer(cfg, TrainConfig(batch_size=512), channel="ETU")
    assert t1._fused_synth_spec is not None     # eligible (spec built)
    assert not t1._use_fused_synth              # ...but off-TPU stays jnp
    t2 = Trainer(cfg, TrainConfig(batch_size=512), channel="mixRayleigh")
    assert t2._fused_synth_spec is not None     # static mixes are eligible
    assert t2._fused_synth_spec.n_classes == 4
    t2a = Trainer(cfg, TrainConfig(batch_size=512), channel="mixAll")
    assert t2a._fused_synth_spec is not None
    assert t2a._fused_synth_spec.n_classes == 5
    assert t2a._fused_synth_spec.block == 80
    # Doppler (mobile) channels are covered since round 2 (per-symbol Jakes
    # path in the kernel); the spec flags mobile and covers the dop cycle
    t3 = Trainer(cfg, TrainConfig(batch_size=512), channel="EVA", mobile=True)
    assert t3._fused_synth_spec is not None and t3._fused_synth_spec.mobile
    t3a = Trainer(cfg, TrainConfig(batch_size=512), channel="mixRayleigh",
                  mobile=True)
    assert t3a._fused_synth_spec is not None and t3a._fused_synth_spec.mobile
    assert len(t3a._fused_synth_spec.dop_cycle) == 12   # lcm(P=4, every-3rd)
    # the dop cycle is STREAMED per-row, so the block stays compile-friendly
    assert t3a._fused_synth_spec.block == 64
    t4 = Trainer(cfg, TrainConfig(batch_size=512), channel="AWGN")
    assert t4._fused_synth_spec is not None
    # big grids keep the jnp chain (VMEM size gate)
    t5 = Trainer(OFDMConfig(nbits=1, nfft=512), TrainConfig(batch_size=512),
                 channel="ETU")
    assert t5._fused_synth_spec is None


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="chip-path test: set RUN_TPU_TESTS=1 with the TPU "
                           "free (a second axon process hangs while another "
                           "holds the chip)")
def test_fused_synthesize_on_chip():
    """Runs the hardware validation of the fused Pallas synthesize kernel
    (scripts/fused_synth_check.py) in a SUBPROCESS so the chip-backend init
    cannot collide with this CPU-pinned test session.  Keeps the Mosaic
    lowering / on-chip PRNG path covered by the suite whenever hardware is
    present (the in-process tests pin the math via the interpreter-mode
    emulator, where the PRNG returns zeros — `ops/fused_synth.py:44-47`)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "fused_synth_check.py"),
         "--validate-only"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]


class TestFusedDoppler:
    """CPU validation of the fused data plane's Doppler (mobile) extension
    (VERDICT round-1 item 3): the kernel/emulator shared helpers must equal
    the jnp channel oracles exactly, and the emulator's mobile statistics
    must match the RayleighChannel Jakes path."""

    def _mobile_spec(self, channel="etu", nbits=1):
        from dl_ofdm_tpu.channel.rayleigh import RayleighChannel
        plan = build_plan(OFDMConfig(nbits=nbits))
        ch = RayleighChannel(channel=channel, nfft=plan.nfft,
                             sample_rate=plan.sample_rate, mobile=True,
                             mix=(channel.startswith("mix")))
        per = {"mixrayleigh": 3, "mixall": 4}.get(ch.channel, 1)
        cyc = int(np.lcm(len(ch.profiles), per))
        dop_cycle = ch._frame_doppler_mask(cyc, ch._frame_profiles(cyc))
        profs = [None if ch._passthrough[i] else p
                 for i, p in enumerate(ch.profiles)]
        spec = fs.build_synth_spec(plan, profs, nbits, fd=ch._fd_np,
                                   dop_cycle=dop_cycle)
        return spec, ch, plan

    def test_jakes_sym_gains_match_channel_doppler(self):
        """_jakes_sym_gains == jakes_gains_from_phases at every symbol time
        (same phases in, identical gains out)."""
        from dl_ofdm_tpu.channel.doppler import SS, jakes_gains_from_phases

        spec, ch, plan = self._mobile_spec("etu")
        b, taps = 6, spec.taps
        rng = np.random.default_rng(3)
        th_re = rng.uniform(0, 2 * np.pi, (b, SS, taps)).astype(np.float32)
        th_im = rng.uniform(0, 2 * np.pi, (b, SS, taps)).astype(np.float32)
        fd = np.full((b,), 300.0, np.float32)
        t = np.arange(spec.nsymbol, dtype=np.float32) * spec.t_sym
        want = np.asarray(jakes_gains_from_phases(
            jnp.asarray(th_re), jnp.asarray(th_im), jnp.asarray(fd),
            jnp.asarray(t), taps))                    # [B, S, taps, 2]

        fvr = fd[:, None] * spec.jakes_base_r.reshape(1, -1)
        fvi = fd[:, None] * spec.jakes_base_i.reshape(1, -1)
        for s in range(spec.nsymbol):
            zr, zi = fs._jakes_sym_gains(
                jnp.asarray(th_re.reshape(b, -1)),
                jnp.asarray(th_im.reshape(b, -1)),
                jnp.asarray(fvr), jnp.asarray(fvi), s * spec.t_sym, taps)
            np.testing.assert_allclose(np.asarray(zr), want[:, s, :, 0],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(zi), want[:, s, :, 1],
                                       rtol=1e-5, atol=1e-5)

    def test_fir_sym_unified_matches_channel_fir(self):
        """The unified-offset per-symbol windowed FIR (pre-shifted kernels,
        static masks) == fir.fir_per_symbol_iq (unshifted kernels, per-row
        offsets) on a mixed-profile batch."""
        from dl_ofdm_tpu.channel import fir

        spec, ch, plan = self._mobile_spec("mixrayleigh")
        b, s = 8, spec.nsymbol
        rng = np.random.default_rng(5)
        x = rng.normal(size=(b, s, spec.sps, 2)).astype(np.float32)
        rows = np.arange(b) % spec.n_classes
        offsets = ch._offset_np[rows]
        max_fir = ch.max_fir
        h_orig = rng.normal(size=(b, s, max_fir, 2)).astype(np.float32)
        # zero each row's kernel beyond its profile's true FIR length
        for i, p in enumerate(rows):
            h_orig[i, :, ch.profiles[p].n_fir:, :] = 0.0
        want = np.asarray(fir.fir_per_symbol_iq(
            jnp.asarray(x), jnp.asarray(h_orig), spec.taps, offsets))

        # pre-shift kernels to the unified offset
        h_shift = np.zeros((b, s, spec.fir_u, 2), np.float32)
        for i, p in enumerate(rows):
            sh = spec.off_u - ch.profiles[p].same_offset
            nf = ch.profiles[p].n_fir
            h_shift[i, :, sh:sh + nf, :] = h_orig[i, :, :nf, :]
        got_r, got_i = fs._fir_sym_unified(
            jnp.asarray(x[..., 0].reshape(b, -1)),
            jnp.asarray(x[..., 1].reshape(b, -1)),
            jnp.asarray(h_shift[..., 0]), jnp.asarray(h_shift[..., 1]),
            jnp.asarray(fs._sym_window_masks(spec)), spec)
        np.testing.assert_allclose(
            np.asarray(got_r).reshape(b, s, spec.sps), want[..., 0],
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_i).reshape(b, s, spec.sps), want[..., 1],
            rtol=1e-4, atol=1e-4)

    def test_emulator_mobile_statistics_match_jnp_chain(self):
        """Mobile ETU: emulator rx/h statistics match the jnp synthesize
        chain (different PRNG streams -> statistical comparison)."""
        from dl_ofdm_tpu.config import TrainConfig
        from dl_ofdm_tpu.train.loop import Trainer

        cfg = OFDMConfig(nbits=1)
        tc = TrainConfig(batch_size=4096, snr=10.0)
        tr = Trainer(cfg, tc, channel="ETU", mobile=True)
        assert tr._fused_synth_spec is not None
        spec = tr._fused_synth_spec
        assert spec.mobile
        b = 1024
        snr = jnp.full((b,), 10.0, jnp.float32)
        bits_e, rx_e, npw_e, h_e = fs.emulate_fused_synthesize(
            spec, b, jax.random.PRNGKey(0), snr, want_h=True)
        bits_j, rx_j, h_j, npw_j, _ = tr.synthesize(
            jax.random.PRNGKey(1), b, snr)
        # batch-norm'd rx: mean ~0, var ~1/2 on both paths
        np.testing.assert_allclose(np.asarray(rx_e).mean(), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(rx_e).var(), 0.5, atol=5e-3)
        np.testing.assert_allclose(np.asarray(rx_j).var(), 0.5, atol=5e-3)
        np.testing.assert_allclose(float(npw_e), float(npw_j), rtol=0.05)
        # per-symbol ground-truth H: time-varying (Doppler) with matching
        # power and comparable symbol-to-symbol decorrelation
        he = np.asarray(h_e)
        hj = np.asarray(h_j)
        assert he.shape == hj.shape == (b, spec.nsymbol, spec.nfft, 2)
        pe = (he ** 2).sum(-1).mean()
        pj = (hj ** 2).sum(-1).mean()
        np.testing.assert_allclose(pe, pj, rtol=0.1)
        dvar_e = np.abs(he[:, 1:] - he[:, :-1]).mean()
        dvar_j = np.abs(hj[:, 1:] - hj[:, :-1]).mean()
        assert dvar_e > 1e-3 and dvar_j > 1e-3      # actually time-varying
        np.testing.assert_allclose(dvar_e, dvar_j, rtol=0.15)

    def test_emulator_mobile_mix_static_rows_match_static_path(self):
        """mixRayleigh mobile: non-Doppler rows must be bit-identical to the
        static emulator (same key), Doppler rows must differ."""
        spec, ch, plan = self._mobile_spec("mixrayleigh")
        static_spec = fs.build_synth_spec(
            plan, [None if ch._passthrough[i] else p
                   for i, p in enumerate(ch.profiles)], 1)
        b = 48
        key = jax.random.PRNGKey(9)
        snr = jnp.full((b,), 8.0, jnp.float32)
        _, _, _, (ym_r, ym_i, _, _) = fs.emulate_fused_synthesize(
            spec, b, key, snr, debug=True)
        _, _, _, (ys_r, ys_i, _, _) = fs.emulate_fused_synthesize(
            static_spec, b, key, snr, debug=True)
        dop = spec.dop_cycle[np.arange(b) % len(spec.dop_cycle)]
        ym = np.asarray(ym_r)
        ys = np.asarray(ys_r)
        np.testing.assert_array_equal(ym[~dop], ys[~dop])
        assert np.abs(ym[dop] - ys[dop]).max() > 1e-4
