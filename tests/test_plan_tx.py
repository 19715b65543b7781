"""Subcarrier plan + OFDM TX parity against an independent NumPy oracle that
restates the reference equations (`/root/reference/dev/py/ofdm.py:198-380`)."""
import numpy as np
import pytest

from dl_ofdm_tpu.config import OFDMConfig
from dl_ofdm_tpu.ofdm.constellation import _table_np
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames, iq_split


def test_lte_plan_derived_constants():
    """Known derived values for nfft=64 / lte / longcp (SURVEY.md C3)."""
    plan = build_plan(OFDMConfig())
    assert plan.cp_len == 16
    assert plan.n_pilot == 8
    assert plan.n_guard == 14
    assert plan.n_dc == 2
    assert plan.frame_size == 320
    assert plan.pilot_size == 16
    assert plan.samples_per_symbol == 80
    assert plan.sample_rate == 0.96e6
    # pilots live in symbols 0 and 4 only
    assert set(plan.pilot_sym.tolist()) == {0, 4}
    # symbol-4 pilots are the symbol-0 comb shifted by 3 effective carriers
    eff = plan.effec_carriers
    p0 = np.sort(plan.pilot_freq[plan.pilot_sym == 0])
    p4 = np.sort(plan.pilot_freq[plan.pilot_sym == 4])
    loc0 = np.searchsorted(eff, p0)
    loc4 = np.searchsorted(eff, p4)
    np.testing.assert_array_equal(np.sort((loc0 + 3) % len(eff)), loc4)


def test_shortcp_plan():
    plan = build_plan(OFDMConfig(longcp=False))
    assert plan.cp_len == 4  # round(64*0.07)


@pytest.mark.parametrize("pilot,npilot,nguard", [
    ("scattered", 8, 8), ("comb", 8, 8), ("block", 8, 8)])
def test_other_pilot_schemes_partition(pilot, npilot, nguard):
    plan = build_plan(OFDMConfig(pilot=pilot, npilot=npilot, nguard=nguard))
    n_total = plan.nfft * plan.nsymbol
    parts = np.concatenate([plan.data_sc, plan.pilot_sc, plan.guard_sc])
    assert len(parts) == n_total
    assert len(np.unique(parts)) == n_total  # exact partition


@pytest.mark.parametrize("nbits", [1, 2, 4])
@pytest.mark.parametrize("longcp", [True, False])
def test_tx_matches_numpy_oracle(nbits, longcp, rng):
    cfg = OFDMConfig(nbits=nbits, longcp=longcp)
    plan = build_plan(cfg)
    n_frames = 6
    bits = rng.integers(0, 2, (n_frames, plan.frame_size, nbits))

    # oracle: reference equations in plain NumPy
    table = _table_np(nbits)
    padded = np.pad(bits.reshape(-1, nbits), [(0, 0), (8 - nbits, 0)])
    sym = table.take(np.packbits(padded.astype(np.uint8), axis=1).ravel())
    grid = np.zeros((n_frames, plan.nsymbol * plan.nfft), np.complex64)
    grid[:, plan.data_sc] = sym.reshape(n_frames, plan.frame_size)
    grid[:, plan.pilot_sc] = 3 + 3j
    time = np.fft.ifft(grid.reshape(-1, plan.nfft))
    want = np.concatenate([time[:, -plan.cp_len:], time], axis=1)
    want = want.reshape(n_frames, plan.nsymbol, plan.samples_per_symbol)

    got = np.asarray(ofdm_modulate_frames(bits, plan))
    np.testing.assert_allclose(got, want, atol=2e-6)

    iq = np.asarray(iq_split(ofdm_modulate_frames(bits, plan)))
    np.testing.assert_allclose(iq[..., 0], want.real, atol=2e-6)
    np.testing.assert_allclose(iq[..., 1], want.imag, atol=2e-6)


def test_tx_ifft_roundtrip():
    """FFT of the CP-stripped TX waveform recovers the subcarrier grid."""
    cfg = OFDMConfig(nbits=2)
    plan = build_plan(cfg)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (4, plan.frame_size, 2))
    wf = np.asarray(ofdm_modulate_frames(bits, plan))
    no_cp = wf[:, :, plan.cp_len:]
    grid = np.fft.fft(no_cp, axis=-1).reshape(4, -1)
    # pilots recovered
    np.testing.assert_allclose(grid[:, plan.pilot_sc], 3 + 3j, atol=1e-4)
    # guards are zero
    np.testing.assert_allclose(grid[:, plan.guard_sc], 0, atol=1e-4)
    # CP really is the tail copy
    np.testing.assert_allclose(wf[:, :, :plan.cp_len], wf[:, :, -plan.cp_len:],
                               atol=1e-6)


def test_tx_iq_real_path_matches_complex_path(rng):
    """The TPU real-pair modulator must equal the complex/np.fft one."""
    from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames_iq
    for nbits in (1, 4):
        cfg = OFDMConfig(nbits=nbits)
        plan = build_plan(cfg)
        bits = rng.integers(0, 2, (5, plan.frame_size, nbits))
        want = np.asarray(ofdm_modulate_frames(bits, plan))
        got = np.asarray(ofdm_modulate_frames_iq(bits, plan))
        np.testing.assert_allclose(got[..., 0], want.real, atol=2e-5)
        np.testing.assert_allclose(got[..., 1], want.imag, atol=2e-5)


def test_tx_fused_gemm_matches_grid_path(rng):
    """The fused placement+IDFT+CP GEMM operator (default TPU hot path) must
    equal the grid/scatter/ifft formulation on every modulation, pilot
    scheme and CP length."""
    from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames_iq
    for nbits in (1, 2, 3, 4):
        for pilot in ("lte", "block", "comb", "scattered"):
            for longcp in (True, False):
                cfg = OFDMConfig(nbits=nbits, pilot=pilot, longcp=longcp)
                plan = build_plan(cfg)
                bits = rng.integers(0, 2, (4, plan.frame_size, nbits))
                grid = np.asarray(
                    ofdm_modulate_frames_iq(bits, plan, fused=False))
                for form in ("symbol", "dense"):
                    fused = np.asarray(
                        ofdm_modulate_frames_iq(bits, plan, fused=form))
                    np.testing.assert_allclose(
                        fused, grid, atol=3e-6,
                        err_msg=f"{form} nbits={nbits} pilot={pilot} "
                                f"longcp={longcp}")


def test_tx_fused_gate_by_operator_size():
    """Large grids must keep the grid/IDFT path: the fused operator bakes
    2*frame_size*S*sps floats of constants (301 MB at nfft=1024 — over the
    remote compiler's request limit) and wastes ~6.6x FLOPs on the operator's
    block-diagonal zeros."""
    from dl_ofdm_tpu.ofdm.tx import _fused_tx_profitable
    assert _fused_tx_profitable(build_plan(OFDMConfig(nbits=1, nfft=64)))
    assert _fused_tx_profitable(build_plan(OFDMConfig(nbits=1, nfft=256)))
    assert not _fused_tx_profitable(build_plan(OFDMConfig(nbits=1, nfft=1024)))
    assert not _fused_tx_profitable(build_plan(OFDMConfig(nbits=1, nfft=2048)))


def test_v1_archive_config_8sym_scattered():
    """The v1 archive used 8 OFDM symbols/frame with scattered pilots
    (`test_v1/OFDM_Benchmark.m`, SURVEY M10); the plan must support it."""
    cfg = OFDMConfig(nsymbol=8, pilot="scattered", npilot=8, nguard=8)
    plan = build_plan(cfg)
    n_total = plan.nfft * plan.nsymbol
    parts = np.concatenate([plan.data_sc, plan.pilot_sc, plan.guard_sc])
    assert len(np.unique(parts)) == len(parts)
    assert len(parts) == n_total
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (3, plan.frame_size, 1))
    wf = ofdm_modulate_frames(bits, plan)
    assert wf.shape == (3, 8, plan.samples_per_symbol)


@pytest.mark.parametrize("nfft", [128, 512, 2048])
def test_large_fft_plans(nfft):
    """Production-scale LTE grids (up to 20 MHz / nfft=2048) plan correctly."""
    cfg = OFDMConfig(nfft=nfft)
    plan = build_plan(cfg)
    n_total = plan.nfft * plan.nsymbol
    parts = np.concatenate([plan.data_sc, plan.pilot_sc, plan.guard_sc])
    assert len(np.unique(parts)) == len(parts) == n_total
    assert plan.n_pilot == 2 * plan.n_rb
    # modulate a couple of frames end to end
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (2, plan.frame_size, 1))
    wf = ofdm_modulate_frames(bits, plan)
    assert wf.shape == (2, 7, plan.samples_per_symbol)


class TestPAPR:
    def test_clip_papr_relative_threshold(self):
        """Samples above peak x mean power are scaled DOWN to exactly the
        threshold amplitude; nothing is ever amplified (regression: the old
        clip used sqrt(peak) absolute and boosted low-power signals)."""
        import jax.numpy as jnp
        from dl_ofdm_tpu.ofdm.papr import clip_papr

        rng = np.random.default_rng(0)
        x = (rng.normal(size=512) + 1j * rng.normal(size=512)) * 0.1
        x[7] = 3.0 + 0j    # outlier far above PAPR 8 of the low mean power
        y = np.asarray(clip_papr(jnp.asarray(x), peak=8.0))
        avg = np.mean(np.abs(x) ** 2)
        thr = np.sqrt(8.0 * avg)
        assert np.abs(y[7]) == pytest.approx(thr, rel=1e-5)
        # clipped, not amplified
        assert np.all(np.abs(y) <= np.abs(x) + 1e-7)
        # untouched samples pass through exactly (modulo the framework's
        # complex64 ingestion cast)
        mask = np.abs(x) ** 2 < 8.0 * avg
        np.testing.assert_array_equal(y[mask], x[mask].astype(np.complex64))

    def test_clip_papr_iq_absolute_norm(self):
        """TF complex_clip semantics: IQ norm capped at `peak` absolutely
        (`dev/py/complex.py:21-27`), returns post-clip mean power."""
        import jax.numpy as jnp
        from dl_ofdm_tpu.ofdm.papr import clip_papr_iq

        x = np.zeros((4, 2), np.float32)
        x[0] = [3.0, 4.0]     # norm 5
        x[1] = [0.3, 0.4]     # norm .5
        y, pwr = clip_papr_iq(jnp.asarray(x), peak=2.0)
        y = np.asarray(y)
        assert np.linalg.norm(y[0]) == pytest.approx(2.0, rel=1e-5)
        np.testing.assert_allclose(y[1], x[1], rtol=1e-6)
        assert float(pwr) == pytest.approx(np.mean(np.sum(y**2, -1)), rel=1e-5)
