"""DCCN receivers (Deep Complex-valued Convolutional Network).

`DCCNReceiver` is the basic learned OFDM receiver — parity with
`ofdm_dense_rx` (`dev/py/model.py:1222-1292`):

  waveform IQ [B, S, K+CP, 2]
    -> optional CP strip (cp=False slices the CP off, `model.py:1236-1240`)
    -> 'fft_like': learned-DFT complex transform K -> nfilter
       (the reference's (1,K) 'same' complex conv; see ops.ComplexDense for
       why that conv IS a complex dense matmul)
    -> 'demodulation': flatten -> Dense(frame_size*2) -> per-symbol 1x1 conv
       (Dense(2^nbits)) -> leaky_relu -> concat IQ -> Dense(nbits*2)
    -> per-bit 2-class logits [B, frame_size, nbits, 2].

The model returns logits (softmax lives in the loss/metric layer; the
reference's in-graph softmax-before-cross-entropy quirk is reproduced there
when `TrainConfig.double_softmax` is set).

`DNNReceiver` is the all-dense ablation, parity with `ofdm_DNN_rx`
(`dev/py/model.py:1539-1625`).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from dl_ofdm_tpu.ops.complex_ops import ComplexDense
from dl_ofdm_tpu.ops.norms import leaky_relu


@dataclasses.dataclass
class RxOutputs:
    """Typed replacement of the reference's named-tensor graph ABI
    (`dev/py/ofdmreceiver_np.py:172-183`)."""
    logits: jnp.ndarray          # [B, frame_size, nbits, 2]
    probs: jnp.ndarray           # softmax of logits (the reference 'output')
    fft_out: jnp.ndarray | None  # [B, S, F, 2] learned-transform activations
    equalized: jnp.ndarray | None = None   # [B, S, n_sc, 2]
    snr_est_db: jnp.ndarray | None = None  # [B, 1]
    chest: jnp.ndarray | None = None       # [B, S, K, 2] channel estimate


class DCCNReceiver(nn.Module):
    nbits: int
    nfft: int
    cp_len: int
    nfilter: int
    frame_size: int
    keep_cp: bool = True          # FLAGS.cp: receiver sees CP (exploitation)
    recombine: str = "true"       # 'reference' reproduces the sign quirk
    compute_dtype: str | None = None  # 'bfloat16' halves HBM traffic on the
                                      # memory-bound forward path; params and
                                      # accumulation stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, s = x.shape[0], x.shape[1]
        cd = self.compute_dtype
        if not self.keep_cp:
            x = x[:, :, self.cp_len: self.cp_len + self.nfft, :]
        # 'fft_like' — learned DFT replacement
        fft_out = ComplexDense(self.nfilter, recombine=self.recombine,
                               compute_dtype=cd,
                               name="fft_like")(x)          # [B, S, F, 2]
        # 'demodulation'
        out = fft_out.reshape(b, s * self.nfilter * 2)
        out = nn.Dense(self.frame_size * 2, dtype=cd, name="Dense_extract")(out)
        out_iq = out.reshape(b, 1, self.frame_size, 2)
        h = nn.Dense(2 ** self.nbits, dtype=cd, name="Dense_conv1x1")(out_iq)
        h = leaky_relu(h)
        h = jnp.concatenate([h, out_iq.astype(h.dtype)], axis=-1)
        h = leaky_relu(nn.Dense(self.nbits * 2, dtype=cd, name="Dense_llr")(h))
        logits = h.reshape(b, self.frame_size, self.nbits, 2)
        return logits.astype(jnp.float32), fft_out


class DNNReceiver(nn.Module):
    """All-dense FC ablation receiver (`ofdm_DNN_rx`, `model.py:1539-1625`).

    The reference function is DEAD CODE: its only call site is commented out
    (`ofdmreceiver_np.py:145`) and enabling it would crash — the final
    `tf.reshape(out, [-1, data_ofdm, nbits, nllr])` folds the symbol axis
    into batch, producing 7x the label batch (same category as the opt=6
    NameError).  It also makes each SYMBOL predict the whole frame's
    `data_ofdm` symbols, which is informationally impossible (a symbol
    carries ~48 of the 320 data subcarriers) — the round-1..3 ablation
    curve's flat 0.234 BER floor was this failure mode reproduced via a
    symbol-mean.  This implementation follows the architecture's evident
    intent (the reference's own commented-out
    `tf.reshape(out, [-1, n_sym * n_sc * m_iq])` flatten at the top of the
    demodulation scope): per-symbol dense stack K*2 -> F*2 -> 250 -> 125,
    FLATTEN the symbol axis, then a frame-level head data*2 -> nbits*2, all
    leaky_relu — an ablation that can actually learn, so the DCCN-vs-DNN
    row is evidence about complex-conv structure, not about a shape bug."""
    nbits: int
    nfft: int
    cp_len: int
    nfilter: int
    frame_size: int
    keep_cp: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, s = x.shape[0], x.shape[1]
        if not self.keep_cp:
            x = x[:, :, self.cp_len: self.cp_len + self.nfft, :]
        k = x.shape[2]
        out = x.reshape(b, s, k * 2)
        for width in (self.nfilter * 2, 250, 125):
            out = leaky_relu(nn.Dense(width)(out))
        out = out.reshape(b, s * 125)            # symbol flatten (see above)
        out = leaky_relu(nn.Dense(self.frame_size * 2)(out))
        out = out.reshape(b, self.frame_size, 2)
        out = leaky_relu(nn.Dense(self.nbits * 2)(out))
        logits = out.reshape(b, self.frame_size, self.nbits, 2)
        return logits, None
