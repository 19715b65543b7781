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

# Extended-tail grid (round-3 VERDICT item 2): the reference grid caps at
# 27 dB, so a BPSK arm (offset 0) never trains above 27 and QPSK (offset
# +2.5) tops out at 29.5 — yet the claim-table protocol tests at 30 dB.
# Both residual claim-cell losses (EPA QPSK @30, EPA BPSK-mobile @30) sit at
# or beyond that training-distribution edge.  The tail grid keeps the same
# 3 dB spacing, extends to 33 dB, and shifts 0.45 of the probability mass
# into the 27-33 bins while preserving the reference shape below 21 dB.
SNR_TAIL_GRID = np.linspace(0.0, 33.0, 12, dtype=np.float32)
SNR_TAIL_PMF = np.asarray([0.01, 0.01, 0.02, 0.02, 0.02, 0.02,
                           0.05, 0.15, 0.25, 0.20, 0.15, 0.10],
                          dtype=np.float32)


def modulation_offset_db(nbits: int) -> float:
    """Default curriculum grid shift for nbits-per-symbol constellations."""
    return 2.5 * (nbits - 1)


def sample_snr(key: jax.Array, n_frames: int, offset_db: float = 0.0,
               tail: bool = False) -> jnp.ndarray:
    """Per-frame curriculum SNR draw.  `tail=True` selects the extended
    0-33 dB grid (mass shifted into the 27-33 bins) instead of the
    reference-parity 0-27 grid."""
    grid, pmf = (SNR_TAIL_GRID, SNR_TAIL_PMF) if tail else (SNR_GRID, SNR_PMF)
    return offset_db + jax.random.choice(
        key, jnp.asarray(grid), shape=(n_frames,), p=jnp.asarray(pmf))
