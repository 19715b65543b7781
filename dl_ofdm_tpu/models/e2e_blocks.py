"""Legacy end-to-end autoencoder blocks (C12) — channel-coding emulation.

Parity with `dev/py/model.py:80-206` (not used by the reference's two main
programs, kept for capability completeness):

  * DenseBlockTx — FC channel-encoder emulation: Dense(codein) -> concat
    skip -> Dense(codeout), tanh head (`:80-117`);
  * ConvBlockTx  — learned constellation mapper: 4x tanh Dense(2^nbits) ->
    1x1 conv to IQ -> 2*tanh, optional (n_sym,1) complex-conv waveform
    shaping (`:121-148`);
  * ConvBlockRx  — mirror of ConvBlockTx (`:151-173`);
  * DenseBlockRx — FC decoder with skip concat -> per-bit softmax logits
    (`:176-206`).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dl_ofdm_tpu.ops.complex_ops import ComplexConv2d
from dl_ofdm_tpu.ops.norms import leaky_relu


class DenseBlockTx(nn.Module):
    codein: int
    codeout: int

    @nn.compact
    def __call__(self, bits: jnp.ndarray) -> jnp.ndarray:
        """[B, S, n_sc, nbits] -> [B, S, n_sc_out, nbits]."""
        b, s, n_sc, nbits = bits.shape
        n_sc_out = (self.codeout * n_sc) // self.codein
        x = bits.reshape(b * s, n_sc * nbits).astype(jnp.float32)
        h = leaky_relu(nn.Dense(n_sc * nbits, name="Dense_code1")(x))
        h = jnp.concatenate([x, h], axis=1)
        h = jnp.tanh(nn.Dense(n_sc_out * nbits, name="Dense_code2")(h))
        return h.reshape(b, s, n_sc_out, nbits)


class ConvBlockTx(nn.Module):
    nbits: int
    use_conv: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, S, n_sc, nbits] -> [B, S, n_sc, 2] learned IQ mapping."""
        b, s, n_sc, _ = x.shape
        h = x.astype(jnp.float32)
        for i in range(4):
            h = jnp.tanh(nn.Dense(2 ** self.nbits, name=f"Dense_map{i}")(h))
        h = 2.0 * jnp.tanh(nn.Dense(2, name="Dense_iq")(h))
        if self.use_conv:
            h = h.reshape(b, s, n_sc, 1, 2)
            h = ComplexConv2d(n_sc, (s, 1), padding="same",
                              name="ShapeConv")(h)
            # keep one waveform stream: sum filters (reference reshapes the
            # filter axis away only when n_filters folds into n_sc)
            h = h.mean(axis=3)
        return h


class ConvBlockRx(nn.Module):
    nbits: int
    use_conv: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, S, n_sc, 2] -> [B, S, n_sc, 2^nbits]."""
        b, s, n_sc, m = x.shape
        h = x
        if self.use_conv:
            h = h.reshape(b, s, n_sc, 1, 2)
            h = ComplexConv2d(n_sc, (s, 1), padding="same",
                              name="ShapeConv")(h)
            h = h.mean(axis=3)
        for i in range(4):
            h = leaky_relu(nn.Dense(2 ** self.nbits, name=f"Dense_demap{i}")(h))
        return h


class DenseBlockRx(nn.Module):
    frame_size: int
    nbits: int
    nllr: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, S, n_sc, C] -> per-bit logits [B, frame_size, nbits, nllr]."""
        b, s, n_sc, c = x.shape
        h = x.reshape(b, s, n_sc * c)
        enc = leaky_relu(nn.Dense(n_sc * self.nbits, name="Dense_rx1")(h))
        h = jnp.concatenate([h, enc], axis=2)
        h = leaky_relu(nn.Dense(self.frame_size * self.nbits * self.nllr,
                                name="Dense_rx2")(h))
        h = h.mean(axis=1)
        return h.reshape(b, self.frame_size, self.nbits, self.nllr)
