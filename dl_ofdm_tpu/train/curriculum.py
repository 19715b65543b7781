"""SNR curriculum sampling for the equalizer fine-tuning stage.

Parity with `dev/py/ofdmreceiver_np_mp.py:386,405,442`: per-frame SNR drawn
from linspace(0, 27, 10) with pmf [.01,.01,.02,.02,.02,.02,.1,.5,.2,.1]
(mass concentrated at 21 dB), sampled on device with `jax.random.choice`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SNR_GRID = np.linspace(0.0, 27.0, 10, dtype=np.float32)
SNR_PMF = np.asarray([0.01, 0.01, 0.02, 0.02, 0.02, 0.02, 0.1, 0.5, 0.2, 0.1],
                     dtype=np.float32)


def sample_snr(key: jax.Array, n_frames: int) -> jnp.ndarray:
    return jax.random.choice(key, jnp.asarray(SNR_GRID), shape=(n_frames,),
                             p=jnp.asarray(SNR_PMF))
