"""Cross-implementation validation on MATLAB-exported waveforms.

Parity with `test_model_mat` (`dev/py/ofdmreceiver_np_mp.py:143-188`) and the
v1 archive tester (`test_v1/test_ofdm_cdnn_awgn.py:88-119`): load
`TX_bit_iq_<mod>_<chan>_FFT<N>[_shortcp].mat` containing `Ch_Data` (complex
waveform columns) and `txbits`, scale IQ by 3 as the reference does
(`:171`), add AWGN per SNR point, and evaluate a trained receiver — the
MATLAB<->framework interoperability contract (shape [n_fr, nsym, K+CP, 2]).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dl_ofdm_tpu.channel.awgn import awgn_channel
from dl_ofdm_tpu.eval.sweep import SweepResult
from dl_ofdm_tpu.ops.norms import batch_norm_ref
from dl_ofdm_tpu.train import metrics as M

MOD_NAMES = ["BPSK", "QPSK", "8QAM", "16QAM"]


def load_mat_waveforms(data_dir: str, nbits: int, channel: str, nfft: int,
                       nsymbol: int, frame_size: int, longcp: bool = True):
    """Returns (chan_iq [n_fr, nsym, K+CP, 2] float32 x3-scaled, bits)."""
    import scipy.io as sio

    cpstr = "" if longcp else "_shortcp"
    name = f"TX_bit_iq_{MOD_NAMES[nbits-1]}_{channel}_FFT{nfft}{cpstr}.mat"
    mat = sio.loadmat(os.path.join(data_dir, name))
    iq = np.transpose(mat["Ch_Data"], (1, 0))
    n_fr = iq.shape[0]
    iq = iq.reshape(n_fr, nsymbol, -1)
    chan_iq = 3.0 * np.stack([iq.real, iq.imag], axis=-1).astype(np.float32)
    bits = mat["txbits"].reshape(n_fr, frame_size, nbits).astype(np.int32)
    return jnp.asarray(chan_iq), jnp.asarray(bits)


def evaluate_on_mat(model, params, chan_iq, bits, snrs=range(-10, 31),
                    seed: int = 0, log_fn=print) -> SweepResult:
    """Sweep AWGN over the fixed MATLAB waveforms and measure BER."""
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def point(key, snr):
        snr_vec = jnp.full((chan_iq.shape[0],), snr, jnp.float32)
        y, _ = awgn_channel(key, chan_iq, snr_vec)
        rx_in = batch_norm_ref(y)
        logits = model.apply({"params": params}, rx_in)[0]
        ce = M.cross_entropy(logits, bits)
        conf = M.confusion_matrix(bits, M.bit_predictions(logits))
        return conf, ce

    bers, losses = [], []
    for snr in snrs:
        key, k = jax.random.split(key)
        conf, ce = point(k, float(snr))
        _, ber = M.ber_from_confusion(conf)
        bers.append(float(ber))
        losses.append(float(ce))
        log_fn(f"SNR: {snr:.2f}, BER: {float(ber):.8f}, Loss: {float(ce):f}")
    return SweepResult(np.asarray(list(snrs), dtype=float),
                       np.asarray(bers), np.asarray(losses))
