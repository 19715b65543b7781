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


def batch_norm_ref(x: jnp.ndarray, eps: float = 1e-9,
                   group_onehot: jnp.ndarray | None = None) -> jnp.ndarray:
    """The reference receiver's input normalization (`ofdmreceiver_np.py:128-129`):
    batch moments over axis 0 (per position), normalize, then divide by sqrt(2).
    Statistics always come from the current batch (TF1 graph had no moving
    averages here), so eval batches must be normalized the same way.

    `group_onehot` [B, G]: compute the moments per frame-group instead of over
    the whole batch — used by the interleaved-SNR sweep so each SNR point gets
    exactly the statistics it would get in its own batch (protocol parity)."""
    if group_onehot is None:
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) / jnp.sqrt(2.0)
    counts = jnp.sum(group_onehot, axis=0)                    # [G]
    flat = x.reshape(x.shape[0], -1)                          # [B, P]
    g_sum = group_onehot.T @ flat                             # [G, P]
    g_mean = g_sum / counts[:, None]
    g_sqsum = group_onehot.T @ (flat * flat)
    g_var = g_sqsum / counts[:, None] - g_mean**2
    mean = (group_onehot @ g_mean).reshape(x.shape)
    var = (group_onehot @ g_var).reshape(x.shape)
    return (x - mean) * jax.lax.rsqrt(var + eps) / jnp.sqrt(2.0)


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    """TF-default leaky relu (alpha=0.2; jax.nn default is 0.01)."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)
