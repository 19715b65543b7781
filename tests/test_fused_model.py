"""Fused DCCN fwd+bwd kernel (ops/fused_model.py) vs jax.grad oracle.

Runs the Pallas kernel in interpret mode on CPU and pins its gradients,
cross-entropy, and confusion matrix against the autodiff of the flax
DCCNReceiver + `train/metrics.py` loss — the exact XLA path it replaces in
`Trainer.train_step`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.ops.fused_model import (ModelSpec, dccn_fused_grads,
                                         reg_grads)
from dl_ofdm_tpu.train import metrics as M
from dl_ofdm_tpu.train.loop import Trainer


def _setup(nbits, n_frames, seed=0):
    cfg = OFDMConfig(nbits=nbits)
    tc = TrainConfig(snr=5.0 * nbits, batch_size=8)
    tr = Trainer(cfg, tc, channel="AWGN")
    key = jax.random.PRNGKey(seed)
    params = tr.init_state(key).params
    bits, rx_in, _, _, _ = tr.synthesize(
        jax.random.PRNGKey(seed + 1), n_frames,
        jnp.full((n_frames,), tc.snr, jnp.float32))
    return tr, params, bits, rx_in


def _oracle(tr, params, bits, rx_in):
    def ce_only(p):
        out = tr.model.apply({"params": p}, rx_in)
        logits = out[0] if isinstance(out, tuple) else out
        return M.cross_entropy(logits, bits)

    ce, grads = jax.value_and_grad(ce_only)(params)
    out = tr.model.apply({"params": params}, rx_in)
    logits = out[0] if isinstance(out, tuple) else out
    conf = M.confusion_matrix(bits, M.bit_predictions(logits))
    return ce, grads, conf


def _kernel_inputs(tr, bits, rx_in):
    plan = tr.plan
    n_frames = rx_in.shape[0]
    l = plan.nsymbol * plan.samples_per_symbol
    xr = rx_in[..., 0].reshape(n_frames, l)
    xi = rx_in[..., 1].reshape(n_frames, l)
    # bits [B, D, n] MSB-first -> symbol index grid [B, D]
    n = bits.shape[-1]
    shifts = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)
    idx = jnp.sum(bits * (1 << shifts), axis=-1).astype(jnp.int32)
    return xr, xi, idx


@pytest.mark.parametrize("nbits", [1, 2, 4])
def test_fused_grads_match_autodiff(nbits):
    tr, params, bits, rx_in = _setup(nbits, n_frames=24, seed=nbits)
    ce_ref, grads_ref, conf_ref = _oracle(tr, params, bits, rx_in)
    plan = tr.plan
    spec = ModelSpec(nsymbol=plan.nsymbol, sps=plan.samples_per_symbol,
                     nfilter=tr.cfg.nfilter, frame_size=plan.frame_size,
                     nbits=nbits, block=16)   # 24 frames -> padded block
    xr, xi, idx = _kernel_inputs(tr, bits, rx_in)
    grads, ce, conf = dccn_fused_grads(spec, 24, params, xr, xi, idx)

    np.testing.assert_allclose(float(ce), float(ce_ref), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(conf), np.asarray(conf_ref))
    flat_ref = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(grads)[0]
    assert [p for p, _ in flat_ref] == [p for p, _ in flat_got]
    for (path, a), (_, b) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_grads_padding_invariance():
    """A batch not divisible by the block size must give identical results
    (padded rows masked)."""
    tr, params, bits, rx_in = _setup(1, n_frames=20, seed=7)
    plan = tr.plan
    xr, xi, idx = _kernel_inputs(tr, bits, rx_in)
    base = ModelSpec(nsymbol=plan.nsymbol, sps=plan.samples_per_symbol,
                     nfilter=tr.cfg.nfilter, frame_size=plan.frame_size,
                     nbits=1, block=16)       # 20 -> 2 blocks, 12 pad rows
    exact = ModelSpec(nsymbol=plan.nsymbol, sps=plan.samples_per_symbol,
                      nfilter=tr.cfg.nfilter, frame_size=plan.frame_size,
                      nbits=1, block=10)      # 20 -> exactly 2 blocks
    g1, ce1, conf1 = dccn_fused_grads(base, 20, params, xr, xi, idx)
    g2, ce2, conf2 = dccn_fused_grads(exact, 20, params, xr, xi, idx)
    np.testing.assert_allclose(float(ce1), float(ce2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(conf1), np.asarray(conf2))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_fuse_norm_variant_matches_plain():
    """fuse_norm=True applied to raw (y, n) planes + affine equals the
    plain kernel on the pre-normalized planes."""
    tr, params, bits, rx_in = _setup(1, n_frames=16, seed=3)
    plan = tr.plan
    l = plan.nsymbol * plan.samples_per_symbol
    xr, xi, idx = _kernel_inputs(tr, bits, rx_in)
    spec_p = ModelSpec(nsymbol=plan.nsymbol, sps=plan.samples_per_symbol,
                       nfilter=tr.cfg.nfilter, frame_size=plan.frame_size,
                       nbits=1, block=16)
    spec_f = ModelSpec(nsymbol=plan.nsymbol, sps=plan.samples_per_symbol,
                       nfilter=tr.cfg.nfilter, frame_size=plan.frame_size,
                       nbits=1, block=16, fuse_norm=True)
    # synthesize an affine: x = y*c0 + n*c1 - c2 with random c, solved so
    # the normalized result equals xr/xi
    key = jax.random.PRNGKey(11)
    c = jax.random.uniform(key, (6, l), minval=0.5, maxval=1.5)
    nr = jax.random.normal(jax.random.fold_in(key, 1), xr.shape)
    ni = jax.random.normal(jax.random.fold_in(key, 2), xi.shape)
    yr = (xr + c[2] - nr * c[1]) / c[0]
    yi = (xi + c[5] - ni * c[4]) / c[3]
    g1, ce1, conf1 = dccn_fused_grads(spec_p, 16, params, xr, xi, idx)
    g2, ce2, conf2 = dccn_fused_grads(spec_f, 16, params, yr, yi, nr, ni,
                                      c, idx)
    np.testing.assert_allclose(float(ce1), float(ce2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(conf1), np.asarray(conf2))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-7)


def test_reg_grads_match_autodiff():
    tr, params, _, _ = _setup(1, n_frames=8, seed=5)
    ber = jnp.float32(0.125)
    rc = 1e-4

    def reg_loss(p):
        return ber * rc * M.l2_regularization(p)

    ref = jax.grad(reg_loss)(params)
    got = reg_grads(params, ber, rc)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref)[0],
            jax.tree_util.tree_flatten_with_path(got)[0]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6, atol=0,
            err_msg=f"reg grad mismatch at {jax.tree_util.keystr(path)}")
