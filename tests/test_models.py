"""Model shape/structure tests: DCCN receiver, equalizer zoo, composition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_ofdm_tpu.config import OFDMConfig
from dl_ofdm_tpu.models.dccn import DCCNReceiver
from dl_ofdm_tpu.models.equalizers import EQUALIZER_REGISTRY, Equalizer
from dl_ofdm_tpu.models.receiver import EqualizedReceiver
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ops.complex_ops import ComplexDense, iq_to_complex, complex_to_iq


def _mk_input(plan, b=3):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(
        size=(b, plan.nsymbol, plan.samples_per_symbol, 2)), jnp.float32)


@pytest.mark.parametrize("nbits", [1, 4])
@pytest.mark.parametrize("keep_cp", [True, False])
def test_dccn_output_shape(nbits, keep_cp):
    cfg = OFDMConfig(nbits=nbits, cp=keep_cp)
    plan = build_plan(cfg)
    model = DCCNReceiver(nbits=nbits, nfft=cfg.nfft, cp_len=plan.cp_len,
                         nfilter=cfg.nfilter, frame_size=plan.frame_size,
                         keep_cp=keep_cp)
    x = _mk_input(plan)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, fft_out = model.apply(variables, x)
    assert logits.shape == (3, plan.frame_size, nbits, 2)
    assert fft_out.shape == (3, plan.nsymbol, cfg.nfilter, 2)
    # fft_like param is the learned-DFT matrix [K_in, F]
    k_in = plan.samples_per_symbol if keep_cp else cfg.nfft
    assert variables["params"]["fft_like"]["wr"].shape == (k_in, cfg.nfilter)


def test_complex_dense_represents_dft():
    """'true' recombination can express the exact DFT; sanity-check by
    setting weights to the DFT matrix and comparing with jnp.fft.fft."""
    k = 16
    dft = np.exp(-2j * np.pi * np.outer(np.arange(k), np.arange(k)) / k)
    layer = ComplexDense(k, use_bias=False)
    x = np.random.default_rng(1).normal(size=(5, k, 2)).astype(np.float32)
    params = {"params": {"wr": jnp.asarray(dft.real, jnp.float32),
                         "wi": jnp.asarray(dft.imag, jnp.float32)}}
    y = layer.apply(params, jnp.asarray(x))
    want = np.fft.fft(x[..., 0] + 1j * x[..., 1])
    np.testing.assert_allclose(np.asarray(iq_to_complex(y)), want, atol=1e-4)


def test_complex_dense_reference_recombine_differs():
    k = 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, k, 2)), jnp.float32)
    key = jax.random.PRNGKey(0)
    p_true = ComplexDense(k, recombine="true").init(key, x)
    y_true = ComplexDense(k, recombine="true").apply(p_true, x)
    # same weights, reference recombination: im part sign-flips the x_im term
    wr = p_true["params"]["wr"]; wi = p_true["params"]["wi"]
    p_ref = {"params": {"wr": wr, "wi": wi,
                        "b": jnp.zeros(k)}}
    y_ref = ComplexDense(k, recombine="reference").apply(p_ref, x)
    xr, xi = x[..., 0], x[..., 1]
    np.testing.assert_allclose(np.asarray(y_ref[..., 0]),
                               np.asarray(xr @ wr - xi @ wi), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_ref[..., 1]),
                               np.asarray(xr @ wi - xi @ wr), atol=1e-5)
    assert np.abs(np.asarray(y_true[..., 1] - y_ref[..., 1])).max() > 1e-3


@pytest.mark.parametrize("opt", sorted(EQUALIZER_REGISTRY))
def test_equalizer_variants_shapes(opt):
    cfg = OFDMConfig()
    plan = build_plan(cfg)
    model = Equalizer(nfft=cfg.nfft, cp_len=plan.cp_len, nsymbol=plan.nsymbol,
                      pilot_size=plan.pilot_size,
                      pilot_carriers=tuple(plan.pilot_carriers),
                      spec=EQUALIZER_REGISTRY[opt])
    x = _mk_input(plan, b=2)
    params = model.init(jax.random.PRNGKey(opt), x)
    eq, snr_db, chest = model.apply(params, x)
    assert eq.shape == (2, plan.nsymbol, plan.samples_per_symbol, 2)
    assert snr_db.shape == (2, 1)
    assert chest.shape == (2, plan.nsymbol, cfg.nfft, 2)
    assert np.isfinite(np.asarray(eq)).all()


def test_equalized_receiver_composition():
    cfg = OFDMConfig()
    plan = build_plan(cfg)
    model = EqualizedReceiver(
        nbits=cfg.nbits, nfft=cfg.nfft, cp_len=plan.cp_len,
        nfilter=cfg.nfilter, frame_size=plan.frame_size,
        nsymbol=plan.nsymbol, pilot_size=plan.pilot_size,
        pilot_carriers=tuple(plan.pilot_carriers))
    x = _mk_input(plan, b=2)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"Equalizer", "receiver"}
    logits, fft_out, eq, snr, chest = model.apply({"params": params}, x)
    assert logits.shape == (2, plan.frame_size, cfg.nbits, 2)


def test_pallas_complex_dense_matches_jnp(rng):
    from dl_ofdm_tpu.ops.pallas_kernels import complex_dense
    xr = rng.normal(size=(24, 80)).astype(np.float32)
    xi = rng.normal(size=(24, 80)).astype(np.float32)
    wr = rng.normal(size=(80, 64)).astype(np.float32)
    wi = rng.normal(size=(80, 64)).astype(np.float32)
    yr, yi = complex_dense(*map(jnp.asarray, (xr, xi, wr, wi)))
    want = (xr + 1j * xi) @ (wr + 1j * wi)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_complex_dense_grads(rng):
    from dl_ofdm_tpu.ops.pallas_kernels import complex_dense
    xr = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    wr = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))

    def loss_pl(xr, xi, wr, wi):
        yr, yi = complex_dense(xr, xi, wr, wi)
        return jnp.sum(yr**2 + 0.5 * yi**2)

    def loss_ref(xr, xi, wr, wi):
        yr = xr @ wr - xi @ wi
        yi = xr @ wi + xi @ wr
        return jnp.sum(yr**2 + 0.5 * yi**2)

    g1 = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(xr, xi, wr, wi)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xr, xi, wr, wi)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_pallas_fir_matches_convolve(rng):
    from dl_ofdm_tpu.ops.pallas_kernels import fir_shift_accum
    f_taps, l = 13, 97
    xa = rng.normal(size=(6, l + f_taps - 1, 2)).astype(np.float32)
    h = rng.normal(size=(6, f_taps, 2)).astype(np.float32)
    y = np.asarray(fir_shift_accum(jnp.asarray(xa), jnp.asarray(h), l))
    xc = xa[..., 0] + 1j * xa[..., 1]
    hc = h[..., 0] + 1j * h[..., 1]
    want = np.stack([np.convolve(xc[i], hc[i], mode="valid")
                     for i in range(6)])
    np.testing.assert_allclose(y[..., 0] + 1j * y[..., 1], want,
                               rtol=1e-4, atol=1e-4)


def test_e2e_blocks_shapes():
    from dl_ofdm_tpu.models.e2e_blocks import (ConvBlockRx, ConvBlockTx,
                                               DenseBlockRx, DenseBlockTx)
    key = jax.random.PRNGKey(0)
    bits = jnp.zeros((2, 7, 48, 2), jnp.int32)
    tx1 = DenseBlockTx(codein=2, codeout=3)
    p = tx1.init(key, bits)
    out = tx1.apply(p, bits)
    assert out.shape == (2, 7, 72, 2)
    tx2 = ConvBlockTx(nbits=2)
    p = tx2.init(key, bits)
    iq = tx2.apply(p, bits)
    assert iq.shape == (2, 7, 48, 2)
    rx1 = ConvBlockRx(nbits=2)
    p = rx1.init(key, iq)
    soft = rx1.apply(p, iq)
    assert soft.shape == (2, 7, 48, 4)
    rx2 = DenseBlockRx(frame_size=320, nbits=2)
    p = rx2.init(key, soft)
    logits = rx2.apply(p, soft)
    assert logits.shape == (2, 320, 2, 2)


def test_single_graph_equalized_rx():
    from dl_ofdm_tpu.models.receiver import SingleGraphEqualizedRx
    cfg = OFDMConfig()
    plan = build_plan(cfg)
    model = SingleGraphEqualizedRx(
        nbits=1, nfft=cfg.nfft, cp_len=plan.cp_len, nfilter=cfg.nfilter,
        frame_size=plan.frame_size, nsymbol=plan.nsymbol,
        pilot_size=plan.pilot_size)
    x = _mk_input(plan, b=2)
    p = model.init(jax.random.PRNGKey(0), x)
    logits, freq, eq, chest = model.apply(p, x)
    assert logits.shape == (2, plan.frame_size, 1, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_complex_dense_pallas_flag_matches_jnp_path():
    cfg_k, f = 80, 64
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 7, cfg_k, 2)), jnp.float32)
    key = jax.random.PRNGKey(0)
    base = ComplexDense(f, use_pallas=False)
    p = base.init(key, x)
    y0 = base.apply(p, x)
    pl_layer = ComplexDense(f, use_pallas=True)
    # pallas path uses br/bi params like the jnp 'true' path -> same tree
    y1 = pl_layer.apply(p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


def test_cascade_equalizer_variant():
    cfg = OFDMConfig()
    plan = build_plan(cfg)
    model = Equalizer(nfft=cfg.nfft, cp_len=plan.cp_len, nsymbol=plan.nsymbol,
                      pilot_size=plan.pilot_size,
                      pilot_carriers=tuple(plan.pilot_carriers),
                      spec=EQUALIZER_REGISTRY[11])
    x = _mk_input(plan, b=2)
    p = model.init(jax.random.PRNGKey(0), x)
    eq, snr_db, chest = model.apply(p, x)
    assert eq.shape == (2, plan.nsymbol, plan.samples_per_symbol, 2)
    assert "Dense_cascade0" in p["params"]
    assert "CascadeConv3" in p["params"]


def test_complex_conv_transpose():
    from dl_ofdm_tpu.ops.complex_ops import ComplexConvTranspose2d
    x = jnp.ones((2, 7, 64, 2), jnp.float32)
    layer = ComplexConvTranspose2d(1, (3, 5))
    p = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(p, x)
    assert y.shape == (2, 7, 64, 2)


def test_awgn_phase_variant():
    from dl_ofdm_tpu.channel.awgn import awgn_channel_phase
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 7, 80, 2)),
                    jnp.float32)
    y, npow = awgn_channel_phase(key, x, jnp.full((32,), 10.0))
    assert y.shape == x.shape
    # the in-graph variant's total complex noise power is level^2 =
    # 0.5*10^(-SNR/10) — half of the NumPy main path (reference quirk:
    # amplitude drawn once and split across I/Q via sin/cos)
    assert float(npow) == pytest.approx(0.5 * 10 ** (-10 / 10), rel=0.2)


def test_bf16_compute_dtype_matches_f32():
    """compute_dtype='bfloat16' keeps params + logits f32 and tracks the f32
    forward within bf16 tolerance (HBM-bandwidth option for the memory-bound
    receiver forward)."""
    import jax
    import jax.numpy as jnp
    from dl_ofdm_tpu.config import OFDMConfig
    from dl_ofdm_tpu.models.dccn import DCCNReceiver
    from dl_ofdm_tpu.ofdm.plan import build_plan

    cfg = OFDMConfig(nbits=2)
    plan = build_plan(cfg)
    kw = dict(nbits=cfg.nbits, nfft=cfg.nfft, cp_len=plan.cp_len,
              nfilter=cfg.nfilter, frame_size=plan.frame_size, keep_cp=True)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (4, plan.nsymbol, plan.samples_per_symbol, 2))
    m32 = DCCNReceiver(**kw)
    mbf = DCCNReceiver(**kw, compute_dtype="bfloat16")
    params = m32.init(jax.random.PRNGKey(1), x)["params"]
    y32, _ = m32.apply({"params": params}, x)
    ybf, _ = mbf.apply({"params": params}, x)   # same params pytree
    assert ybf.dtype == jnp.float32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    # bf16 has ~8 bits of mantissa; activations are O(1)
    np.testing.assert_allclose(np.asarray(ybf), np.asarray(y32),
                               atol=0.12, rtol=0.12)
    err = np.max(np.abs(np.asarray(ybf) - np.asarray(y32)))
    assert err > 0  # genuinely computed in bf16, not silently upcast


def test_pallas_vmem_guard_boundaries():
    """The fused-kernel VMEM guard admits the reference-scale grids and
    rejects the large-LTE shapes that exceeded the 16MB scoped limit
    (K=1280/F=1024 at nfft=2048 OOM'd on-chip before the guard)."""
    from dl_ofdm_tpu.ops.complex_ops import _pallas_fits
    assert _pallas_fits(80, 64)        # nfft=64 reference grid
    assert _pallas_fits(320, 256)      # nfft=256 production grid
    assert not _pallas_fits(1280, 1024)   # nfft=2048: 21MB+ of panels
    assert not _pallas_fits(2560, 2048)


def test_pallas_bf16_path_matches_xla_bf16_path():
    """compute_dtype='bfloat16' routes through the fused kernel (bf16 GEMM
    inputs, f32 accumulation) and must match the XLA mm() lowering; the
    custom VJP must return f32 parameter gradients through the astype."""
    import jax
    import jax.numpy as jnp
    from dl_ofdm_tpu.ops.complex_ops import ComplexDense

    x = jax.random.normal(jax.random.PRNGKey(0), (6, 40, 2), jnp.float32)

    def build(use_pallas):
        return ComplexDense(32, compute_dtype="bfloat16",
                            use_pallas=use_pallas)

    params = build(False).init(jax.random.PRNGKey(1), x)
    y_xla = build(False).apply(params, x)
    y_pal = build(True).apply(params, x)
    assert y_pal.dtype == y_xla.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               rtol=2e-2, atol=2e-2)

    def loss(p, mod):
        return jnp.sum(mod.apply(p, x) ** 2)

    g_xla = jax.grad(loss)(params, build(False))
    g_pal = jax.grad(loss)(params, build(True))
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pal)):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)


def test_zf_equalize_restores_amplitude():
    """opt-12 extension (EQUALIZER_REGISTRY[12]): with a perfect channel
    estimate, zero-forcing equalization recovers the transmitted symbols
    (amplitude included) while the reference's phase-only division
    (`dev/py/model.py:430-434`) leaves the |H| amplitude distortion —
    the structural cause of the 16QAM-over-fading BER floor."""
    from dl_ofdm_tpu.models.equalizers import equalize_iq
    from dl_ofdm_tpu.ops import cfloat

    rng = np.random.default_rng(7)
    b, s, k = 3, 7, 64
    x = rng.normal(size=(b, s, k, 2)).astype(np.float32)       # tx symbols
    h = rng.normal(size=(b, 1, k, 2)).astype(np.float32) * 2.0  # channel
    h = np.broadcast_to(h, (b, s, k, 2))
    y = np.asarray(cfloat.cmul_iq(jnp.asarray(x), jnp.asarray(h)))

    # scaled perfect estimate: learned chest is only defined up to scale
    chest = jnp.asarray(0.37 * h)
    zf = np.asarray(equalize_iq(jnp.asarray(y), chest, "zf"))
    # zf output == x up to one GLOBAL per-batch scale (the RMS normalizer)
    scale = np.sum(zf * x, axis=(1, 2, 3)) / np.sum(x * x, axis=(1, 2, 3))
    rel = np.linalg.norm(zf - scale[:, None, None, None] * x, axis=-1) / (
        np.linalg.norm(x, axis=-1) * np.abs(scale[:, None, None]) + 1e-9)
    assert np.median(rel) < 0.05   # deep fades excepted (bounded inverse)

    ph = np.asarray(equalize_iq(jnp.asarray(y), chest, "phase"))
    # phase-only: per-subcarrier amplitude error |H| remains
    amp_ratio = np.linalg.norm(ph, axis=-1) / (np.linalg.norm(x, axis=-1) + 1e-9)
    assert np.std(amp_ratio) > 0.5
