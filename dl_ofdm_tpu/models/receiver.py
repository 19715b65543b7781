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
            name="receiver")(equalized)
        return logits, fft_out, equalized, snr_db, chest
