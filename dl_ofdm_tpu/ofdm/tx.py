"""Jittable OFDM transmitter: bits -> QAM -> frame grid -> IFFT -> CP.

TPU-native re-design of the reference's host-side NumPy TX
(`dev/py/ofdm.py:328-380`, `ofdm_tx_frame_np`): the whole modulator is a pure
function of (bits, static plan) and runs on device inside the same XLA program
as the channel and the receiver, removing the host->device feed boundary of the
reference training loop (`dev/py/ofdmreceiver_np.py:230-234`).

Semantics parity: constellation LUT gather (packbits-compatible bit order),
frame-level scatter of data/pilot subcarriers (pilot value 3+3j), unscaled
`ifft` (NumPy 1/N normalization), CP = last `cp_len` samples prepended.
"""
from __future__ import annotations

import jax.numpy as jnp

from dl_ofdm_tpu.config import OFDMConfig
from dl_ofdm_tpu.ofdm.constellation import bits_to_symbols
from dl_ofdm_tpu.ofdm.plan import SubcarrierPlan, build_plan
from dl_ofdm_tpu.ops import cfloat


def ofdm_modulate_frames_iq(bits: jnp.ndarray, plan: SubcarrierPlan) -> jnp.ndarray:
    """Real-pair OFDM modulator: [n_frame, frame_size, nbits] -> [B, S, K+CP, 2].

    The TPU path: this backend has no complex dtype, so the IFFT is a real
    IDFT matmul pair (see `ops.cfloat`) — at nfft=64 a [7B, 64] x [64, 64]
    GEMM, which is also the faster formulation on the MXU.
    Numerically equivalent to `ofdm_modulate_frames` (np.fft.ifft parity).
    """
    from dl_ofdm_tpu.ops import cfloat
    from dl_ofdm_tpu.ofdm.constellation import const_table, indices_from_bits

    n_frame = bits.shape[0]
    if bits.shape[1] != plan.frame_size:
        raise ValueError(
            f"bits frame_size {bits.shape[1]} != plan frame_size {plan.frame_size}")
    nbits = bits.shape[-1]
    table = const_table(nbits)
    table_iq = jnp.stack([jnp.real(table), jnp.imag(table)],
                         axis=-1).astype(jnp.float32)
    sym_iq = table_iq[indices_from_bits(bits)]       # [B, frame, 2]

    grid = jnp.zeros((n_frame, plan.nsymbol * plan.nfft, 2), jnp.float32)
    grid = grid.at[:, plan.data_sc, :].set(sym_iq)
    pilot = jnp.asarray([plan.pilot_value.real, plan.pilot_value.imag],
                        jnp.float32)
    grid = grid.at[:, plan.pilot_sc, :].set(pilot)
    grid = grid.reshape(n_frame, plan.nsymbol, plan.nfft, 2)

    time = cfloat.idft_iq(grid)                      # [B, S, K, 2]
    return jnp.concatenate([time[:, :, -plan.cp_len:, :], time], axis=2)


def ofdm_modulate_frames(bits: jnp.ndarray, plan: SubcarrierPlan) -> jnp.ndarray:
    """Modulate bits into time-domain OFDM frames.

    Args:
      bits: [n_frame, frame_size, nbits] in {0,1}.
      plan: static subcarrier plan.

    Returns:
      complex64 [n_frame, nsymbol, nfft + cp_len] time-domain waveform.
    """
    n_frame = bits.shape[0]
    if bits.shape[1] != plan.frame_size:
        raise ValueError(
            f"bits frame_size {bits.shape[1]} != plan frame_size {plan.frame_size}")
    symbols = bits_to_symbols(bits)  # [n_frame, frame_size] complex64

    grid = jnp.zeros((n_frame, plan.nsymbol * plan.nfft), dtype=jnp.complex64)
    grid = grid.at[:, plan.data_sc].set(symbols)
    grid = grid.at[:, plan.pilot_sc].set(
        jnp.asarray(plan.pilot_value, dtype=jnp.complex64))
    grid = grid.reshape(n_frame, plan.nsymbol, plan.nfft)

    time = jnp.fft.ifft(grid, axis=-1).astype(jnp.complex64)
    with_cp = jnp.concatenate([time[..., -plan.cp_len:], time], axis=-1)
    return with_cp


# canonical IQ<->complex conversions live in ops.cfloat; these aliases keep
# the TX module's public names (from_complex pins float32 — the framework-wide
# IQ dtype)
iq_split = cfloat.from_complex
iq_join = cfloat.to_complex


class OFDMTx:
    """Convenience wrapper mirroring the reference `ofdm_tx` class API
    (`dev/py/ofdm.py:198-273`): holds the plan and exposes frame modulation."""

    def __init__(self, cfg: OFDMConfig):
        self.cfg = cfg
        self.plan = build_plan(cfg)

    def __call__(self, bits: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (complex waveform [B, S, K+CP], IQ view [B, S, K+CP, 2])."""
        wf = ofdm_modulate_frames(bits, self.plan)
        return wf, iq_split(wf)
