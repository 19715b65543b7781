"""Composed receivers: equalizer stage grafted in front of the DCCN receiver.

JAX-native replacement of the reference's TF1 graph surgery
(`tf.contrib.graph_editor.reroute_inputs`, `dev/py/ofdmreceiver_np_mp.py:
264-322`): the equalizer and the pretrained receiver are ordinary composed
modules; "grafting" is parameter-tree surgery (insert pretrained receiver
params under 'receiver', fresh equalizer params under 'Equalizer') and
"freezing" is an optimizer mask — see `dl_ofdm_tpu.train.transfer`.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dl_ofdm_tpu.models.dccn import DCCNReceiver
from dl_ofdm_tpu.models.equalizers import Equalizer, EqSpec


class SingleGraphEqualizedRx(nn.Module):
    """Single-graph equalized receiver — parity with `ofdm_equalized_rx`
    (`dev/py/model.py:1421-1535`), the legacy all-in-one alternative to the
    two-stage transfer-learning composition: layer-norm -> optional CP strip
    -> Dense -> learned-DFT -> channel-estimation subnet (pilot extraction,
    interpolation, (S,K) complex-conv refinement, normalize-and-equalize)
    -> demodulation head."""

    nbits: int
    nfft: int
    cp_len: int
    nfilter: int
    frame_size: int
    nsymbol: int
    pilot_size: int
    keep_cp: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        import jax.numpy as jnp  # noqa: F811
        from dl_ofdm_tpu.ops import cfloat
        from dl_ofdm_tpu.ops.complex_ops import ComplexConv2d, ComplexDense
        from dl_ofdm_tpu.ops.norms import frame_layer_norm, leaky_relu

        b, s = x.shape[0], x.shape[1]
        f = self.nfilter
        h = frame_layer_norm(x)
        if not self.keep_cp:
            h = h[:, :, self.cp_len: self.cp_len + self.nfft, :]
        k = h.shape[2]
        h = nn.Dense(f * 2, name="Dense_in")(h.reshape(b, s, k * 2))
        h = h.reshape(b, s, f, 2)
        freq = ComplexDense(f, name="fft_like")(h)       # [B, S, F, 2]

        # channel estimation subnet
        c = freq.reshape(b, s * f * 2)
        c = nn.Dense(self.pilot_size * 2, name="Dense_pilot")(c)
        c = nn.Dense(s * f * 2, name="Dense_interp0")(c)
        c = nn.Dense(s * f * 2, name="Dense_interp1")(c)
        c = c.reshape(b, s, f, 1, 2)
        c = ComplexConv2d(1, (s, f), padding="same", name="RefineConv")(c)
        chest = c.reshape(b, s, f, 2)
        h_norm = cfloat.conj_iq(chest) / (
            cfloat.abs_iq(chest, eps=1e-24)[..., None] + 1e-12)
        eq = cfloat.cmul_iq(freq, h_norm)

        # demodulation head
        o = eq.reshape(b, s * f * 2)
        o = nn.Dense(self.frame_size * 2, name="Dense_extract")(o)
        o = o.reshape(b, 1, self.frame_size, 2)
        o2 = leaky_relu(o)
        o2 = jnp.concatenate([o2, o], axis=-1)
        o2 = leaky_relu(nn.Dense(self.nbits * 2, name="Dense_llr")(o2))
        logits = o2.reshape(b, self.frame_size, self.nbits, 2)
        return logits, freq, eq, chest


class EqualizedReceiver(nn.Module):
    """input IQ waveform -> (logits, fft_out, equalized, snr_db, chest)."""

    nbits: int
    nfft: int
    cp_len: int
    nfilter: int
    frame_size: int
    nsymbol: int
    pilot_size: int
    pilot_carriers: tuple
    keep_cp: bool = True
    recombine: str = "true"
    eq_spec: EqSpec = EqSpec()
    compute_dtype: str | None = None  # forwarded to the grafted DCCN receiver

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        equalized, snr_db, chest = Equalizer(
            nfft=self.nfft, cp_len=self.cp_len, nsymbol=self.nsymbol,
            pilot_size=self.pilot_size, pilot_carriers=self.pilot_carriers,
            spec=self.eq_spec, keep_cp=self.keep_cp, name="Equalizer")(x)
        logits, fft_out = DCCNReceiver(
            nbits=self.nbits, nfft=self.nfft, cp_len=self.cp_len,
            nfilter=self.nfilter, frame_size=self.frame_size,
            keep_cp=self.keep_cp, recombine=self.recombine,
            compute_dtype=self.compute_dtype,
            name="receiver")(equalized)
        return logits, fft_out, equalized, snr_db, chest
