"""Normalization and activation primitives with reference-exact semantics."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_layer_norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-example layer norm over all non-batch axes, no learned affine.

    Parity with `tf.contrib.layers.layer_norm(x, center=False, scale=False,
    begin_norm_axis=1)` as used at the top of every equalizer variant
    (`dev/py/model.py:363` etc.): statistics over axes 1..N-1 jointly.
    """
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def batch_norm_ref(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """The reference receiver's input normalization (`ofdmreceiver_np.py:128-129`):
    batch moments over axis 0 (per position), normalize, then divide by sqrt(2).
    Statistics always come from the current batch (TF1 graph had no moving
    averages here), so eval batches must be normalized the same way."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) / jnp.sqrt(2.0)


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    """TF-default leaky relu (alpha=0.2; jax.nn default is 0.01)."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)
