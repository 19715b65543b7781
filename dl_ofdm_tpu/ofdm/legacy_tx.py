"""Legacy transmitter variants from the reference (capability parity).

The reference carries three transmitters; the main path (`ofdm_tx_frame_np`,
`dev/py/ofdm.py:328-380`) is `ofdm/tx.py` here.  This module covers the other
two, which differ in pilot layout and I/O contract:

* `ofdm_tx_np` (`dev/py/ofdm.py:276-325`): per-SYMBOL pilots — the symbol-0
  pilot comb is inserted into EVERY OFDM symbol (no frame-level rotation),
  input is per-symbol data bits, and it additionally returns the "pilot IQ"
  slice `waveform[:, :, pilotCarriers, :]` (a reference quirk: the slice
  indexes TIME samples at pilot-subcarrier positions — reproduced verbatim).
* `ofdm_transmitter` (`dev/py/ofdm.py:384-451`): the legacy in-graph TF TX
  with its own subcarrier plan: CP fixed at 25%, NO DC null, guards split at
  both edges, pilots every (K//P)-th effective carrier, data carriers by
  positional delete.  Its pilot output is the (quirky, reproduced) reversed
  slice `waveform[:, :, CP : K//P : -1, :]`.

Both are jittable real-pair programs (grid scatter -> IDFT GEMM -> CP), built
from the same static-index machinery as the main TX.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax.numpy as jnp

from dl_ofdm_tpu.ofdm.constellation import const_table, indices_from_bits
from dl_ofdm_tpu.ofdm.plan import SubcarrierPlan
from dl_ofdm_tpu.ops import cfloat


def _bits_to_symbol_iq(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., nbits] {0,1} -> [..., 2] constellation points (real-pair)."""
    nbits = bits.shape[-1]
    table = const_table(nbits)
    table_iq = jnp.stack([jnp.real(table), jnp.imag(table)],
                         axis=-1).astype(jnp.float32)
    return table_iq[indices_from_bits(bits)]


def ofdm_modulate_symbol_pilots(bits: jnp.ndarray, plan: SubcarrierPlan):
    """Per-symbol-pilot modulator (`ofdm_tx_np`, `dev/py/ofdm.py:276-325`).

    Every OFDM symbol carries the symbol-0 pilot comb (`plan.pilot_carriers`)
    at `plan.pilot_value`; data fills `plan.data_carriers`.

    Args:
      bits: [n_sym, n_data, nbits] {0,1}, n_sym a multiple of plan.nsymbol,
        n_data == len(plan.data_carriers).
    Returns:
      (iq [n_frame, nsymbol, K+CP, 2],
       pilot_iq [n_frame, nsymbol, P, 2] — the reference's time-sample slice
       at pilot-carrier indices, quirk reproduced).
    """
    n_sym, n_data, _ = bits.shape
    if n_data != len(plan.data_carriers):
        raise ValueError(f"per-symbol data size {n_data} != "
                         f"{len(plan.data_carriers)}")
    if n_sym % plan.nsymbol:
        raise ValueError(f"n_sym {n_sym} not a multiple of {plan.nsymbol}")
    sym_iq = _bits_to_symbol_iq(bits)                       # [n_sym, n_data, 2]

    grid = jnp.zeros((n_sym, plan.nfft, 2), jnp.float32)
    grid = grid.at[:, plan.data_carriers, :].set(sym_iq)
    pilot = jnp.asarray([plan.pilot_value.real, plan.pilot_value.imag],
                        jnp.float32)
    grid = grid.at[:, plan.pilot_carriers, :].set(pilot)

    time = cfloat.idft_iq(grid)                             # [n_sym, K, 2]
    with_cp = jnp.concatenate([time[:, -plan.cp_len:, :], time], axis=1)
    iq = with_cp.reshape(-1, plan.nsymbol, plan.samples_per_symbol, 2)
    pilot_iq = iq[:, :, plan.pilot_carriers, :]
    return iq, pilot_iq


@dataclasses.dataclass(frozen=True)
class LegacyTxPlan:
    """Static plan of the legacy in-graph TX (`dev/py/ofdm.py:391-407`).

    Differs from `SubcarrierPlan`: CP always 25%, no DC null, and the data
    carriers come from a positional (not value) delete of the pilot comb."""

    nfft: int
    cp_len: int
    n_pilot: int            # requested P (FLAGS.npilot); len(pilot_carriers)
                            # may be smaller (e.g. 7 for K=64, G=8, P=8)
    n_guard: int
    data_carriers: np.ndarray
    pilot_carriers: np.ndarray
    guard_carriers: np.ndarray


@functools.lru_cache(maxsize=None)
def legacy_tx_plan(nfft: int, npilot: int, nguard: int) -> LegacyTxPlan:
    k, p, g = nfft, npilot, nguard
    all_carriers = np.arange(k)
    effec = all_carriers[g // 2: k - g // 2]
    pilot_carriers = effec[:: k // p]
    guard_carriers = np.delete(all_carriers, effec)
    # positional delete, exactly as the reference writes it
    data_carriers = np.delete(effec, pilot_carriers - g // 2)
    return LegacyTxPlan(nfft=k, cp_len=k // 4, n_pilot=p,
                        n_guard=g, data_carriers=data_carriers,
                        pilot_carriers=pilot_carriers,
                        guard_carriers=guard_carriers)


def ofdm_transmitter_iq(bits: jnp.ndarray, nfft: int, npilot: int,
                        nguard: int):
    """Legacy in-graph transmitter (`ofdm_transmitter`, `dev/py/ofdm.py:384-451`).

    Args:
      bits: [B, n_sym, n_data, nbits] {0,1} with
        n_data == len(legacy_tx_plan(...).data_carriers).
    Returns:
      (iq [B, n_sym, K+CP, 2],
       pilot_iq — the reference's reversed time-sample slice
       `iq[:, :, CP : K//P : -1, :]`, quirk reproduced verbatim).
    """
    plan = legacy_tx_plan(nfft, npilot, nguard)
    b, n_sym, n_data, _ = bits.shape
    if n_data != len(plan.data_carriers):
        raise ValueError(f"data size {n_data} != {len(plan.data_carriers)}")
    sym_iq = _bits_to_symbol_iq(bits).reshape(b * n_sym, n_data, 2)

    grid = jnp.zeros((b * n_sym, plan.nfft, 2), jnp.float32)
    grid = grid.at[:, plan.data_carriers, :].set(sym_iq)
    pilot = jnp.asarray([3.0, 3.0], jnp.float32)      # pilotValue = 3+3j
    grid = grid.at[:, plan.pilot_carriers, :].set(pilot)

    time = cfloat.idft_iq(grid)                       # [B*n_sym, K, 2]
    with_cp = jnp.concatenate([time[:, -plan.cp_len:, :], time], axis=1)
    iq = with_cp.reshape(b, n_sym, plan.nfft + plan.cp_len, 2)
    pilot_iq = iq[:, :, plan.cp_len: plan.nfft // plan.n_pilot: -1, :]
    return iq, pilot_iq
