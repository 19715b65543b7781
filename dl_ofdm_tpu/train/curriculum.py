"""SNR curriculum sampling for the equalizer fine-tuning stage.

Parity with `dev/py/ofdmreceiver_np_mp.py:386,405,442`: per-frame SNR drawn
from linspace(0, 27, 10) with pmf [.01,.01,.02,.02,.02,.02,.1,.5,.2,.1]
(mass concentrated at 21 dB), sampled on device with `jax.random.choice`.

Extension: `offset_db` shifts the whole grid up for higher-order
modulations.  The reference only ever ran its equalizer stage at BPSK
(`dev/py/run_local_ofdm.py:92`), where 0-27 dB covers the useful operating
range; 8/16-QAM over fading need ~6-9 dB more SNR for the same BER (its own
AWGN stage acknowledges this by pretraining at SNR = 5*nbits dB,
`run_local_ofdm.py:64-70`), so `modulation_offset_db` applies the same
per-bit scaling to the curriculum: +2.5 dB per extra bit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SNR_GRID = np.linspace(0.0, 27.0, 10, dtype=np.float32)
SNR_PMF = np.asarray([0.01, 0.01, 0.02, 0.02, 0.02, 0.02, 0.1, 0.5, 0.2, 0.1],
                     dtype=np.float32)


def modulation_offset_db(nbits: int) -> float:
    """Default curriculum grid shift for nbits-per-symbol constellations."""
    return 2.5 * (nbits - 1)


def sample_snr(key: jax.Array, n_frames: int,
               offset_db: float = 0.0) -> jnp.ndarray:
    return offset_db + jax.random.choice(
        key, jnp.asarray(SNR_GRID), shape=(n_frames,),
        p=jnp.asarray(SNR_PMF))
