"""Gray-mapped constellations and (de)mapping, as static JAX lookup tables.

Reproduces the reference's exact constellation values (`dev/py/ofdm.py:24-78`):
non-unit-power Gray maps — BPSK at +-3*sqrt(2), QPSK at +-3+-3j, 8QAM as a 4x2
rectangle scaled by |3+3j|/|3+1j|, 16QAM on the +-1/+-3 grid.  The bit tuple
(b0..b_{n-1}) indexes the table as a big-endian integer, matching the
reference's `np.packbits` path (`dev/py/ofdm.py:293-298`).

The MATLAB-compatible tables (`matlab_gray_table`) reproduce `qammod(k,M,'gray')`
used by the classical baseline suite (`dev/m/OFDM_Benchmark_dev.m:227,244-246`);
they are the same Gray labelings with per-symbol bit order reversed and without
the reference's power scaling.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_BPSK_AMP = 4.24264  # 3*sqrt(2) rounded as in the reference
_8QAM_SCALE = 4.2426 / 3.1623  # |3+3j| / |3+1j|


@functools.lru_cache(maxsize=None)
def _table_np(nbits: int) -> np.ndarray:
    """Constellation LUT indexed by the big-endian integer of the bit tuple."""
    if nbits == 1:
        pts = [-_BPSK_AMP + 0j, _BPSK_AMP + 0j]
    elif nbits == 2:
        # (b0,b1): b0 flips Q sign, b1 selects the I sign
        pts = [-3 + 3j, 3 + 3j, -3 - 3j, 3 - 3j]
    elif nbits == 3:
        base = [-3 + 1j, 3 + 1j, -1 + 1j, 1 + 1j, -3 - 1j, 3 - 1j, -1 - 1j, 1 - 1j]
        pts = [p * _8QAM_SCALE for p in base]
    elif nbits == 4:
        pts = [
            -3 + 3j, 3 + 3j, -1 + 3j, 1 + 3j,
            -3 - 3j, 3 - 3j, -1 - 3j, 1 - 3j,
            -3 + 1j, 3 + 1j, -1 + 1j, 1 + 1j,
            -3 - 1j, 3 - 1j, -1 - 1j, 1 - 1j,
        ]
    else:
        raise ValueError("nbits must be in 1..4")
    return np.asarray(pts, dtype=np.complex64)


def const_table(nbits: int) -> jnp.ndarray:
    """Reference constellation LUT, shape [2**nbits] complex64."""
    return jnp.asarray(_table_np(nbits))


@functools.lru_cache(maxsize=None)
def _bit_table_np(nbits: int) -> np.ndarray:
    """[2**nbits, nbits] int32: big-endian bits of each symbol index."""
    idx = np.arange(2**nbits)
    return np.stack(
        [(idx >> (nbits - 1 - b)) & 1 for b in range(nbits)], axis=-1
    ).astype(np.int32)


def indices_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., nbits] {0,1} -> [...] symbol indices (big-endian, packbits-compatible)."""
    nbits = bits.shape[-1]
    weights = jnp.asarray([1 << (nbits - 1 - b) for b in range(nbits)], dtype=jnp.int32)
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def bits_from_indices(idx: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """[...] indices -> [..., nbits] bits (big-endian)."""
    table = jnp.asarray(_bit_table_np(nbits))
    return table[idx]


def bits_to_symbols(bits: jnp.ndarray) -> jnp.ndarray:
    """Map [..., nbits] bits to complex symbols via the reference LUT."""
    nbits = bits.shape[-1]
    return const_table(nbits)[indices_from_bits(bits)]


@functools.lru_cache(maxsize=None)
def _matlab_table_np(m: int) -> np.ndarray:
    """MATLAB `qammod(0:M-1, M, 'gray')` constellation (M in {2,4,8,16}).

    Equals the reference Python table with the per-symbol bit order reversed
    and without power scaling (BPSK +-1, 8QAM unscaled rectangle)."""
    nbits = int(np.log2(m))
    ref = _table_np(nbits)
    if nbits == 1:
        ref = ref / _BPSK_AMP
    elif nbits == 2:
        ref = ref / 3.0
    elif nbits == 3:
        ref = ref / _8QAM_SCALE
    out = np.empty_like(ref)
    for k in range(m):
        rev = int(f"{k:0{nbits}b}"[::-1], 2)
        out[k] = ref[rev]
    return out


def matlab_gray_table(m: int) -> jnp.ndarray:
    return jnp.asarray(_matlab_table_np(m))


def demod_nearest(symbols: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Min-distance hard demapping: [...] complex -> [...] symbol indices.

    Vectorized |y - c_k|^2 argmin over the (<=16-point) table; used by the
    classical baseline receiver (`qamdemod` equivalent,
    `dev/m/OFDM_Benchmark_dev.m:447`)."""
    d2 = jnp.abs(symbols[..., None] - table) ** 2
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)
