"""Halo-exchange FIR over a device mesh (overlap-save across shards).

The reference processes each frame's waveform on one host with
`np.convolve(..., 'same')`.  When a long IQ time-block is sharded over a mesh
axis (the sequence-parallel analog for FIR channels, SURVEY.md section 5.7),
each shard needs `F-1` boundary samples from its neighbors to compute its
'same' window exactly.  Here the halos ride the ICI ring via
`jax.lax.ppermute`, and the global edges are zero-masked to reproduce
`np.convolve`'s zero-padded semantics bit-for-bit.

Layout: time axis sharded over `axis_name`; the FIR kernel (per batch row) is
replicated.  out[n] = sum_k h[k] * x[n + off - k] with off = (F-1)//2 for
'same' (any static off in [0, F-1] is supported, e.g. 0 for causal/MATLAB
filtering).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_fir_same_iq(x: jnp.ndarray, h: jnp.ndarray, offset: int,
                     axis_name: str) -> jnp.ndarray:
    """Sharded 'same' FIR; call inside shard_map with the time axis sharded.

    Args:
      x: [B, L_local, 2] local shard of the waveform (time axis sharded).
      h: [B, F, 2] FIR kernels (replicated across the axis).
      offset: static alignment, (F_orig-1)//2 for np.convolve 'same'.
      axis_name: mesh axis the time dimension is sharded over.

    Returns [B, L_local, 2].
    """
    f = h.shape[1]
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    halo_l = f - 1 - offset   # samples needed from the left neighbor
    halo_r = offset           # samples needed from the right neighbor

    parts = []
    if halo_l > 0:
        # receive the tail of the left neighbor (shard i gets from i-1)
        left_tail = x[:, -halo_l:, :]
        recv_l = jax.lax.ppermute(
            left_tail, axis_name,
            perm=[(i, (i + 1) % n_dev) for i in range(n_dev)])
        recv_l = jnp.where(idx == 0, jnp.zeros_like(recv_l), recv_l)
        parts.append(recv_l)
    parts.append(x)
    if halo_r > 0:
        right_head = x[:, :halo_r, :]
        recv_r = jax.lax.ppermute(
            right_head, axis_name,
            perm=[(i, (i - 1) % n_dev) for i in range(n_dev)])
        recv_r = jnp.where(idx == n_dev - 1, jnp.zeros_like(recv_r), recv_r)
        parts.append(recv_r)
    ext = jnp.concatenate(parts, axis=1)     # [B, halo_l + L + halo_r, 2]

    l_local = x.shape[1]
    out_r = jnp.zeros((x.shape[0], l_local), x.dtype)
    out_i = jnp.zeros((x.shape[0], l_local), x.dtype)
    # ext[m] = x_global[local_start - halo_l + m]; out[n] needs x[n + off - k]
    # -> ext index n + off - k + halo_l = n + (f - 1 - k)
    for k in range(f):
        s = f - 1 - k
        xs = jax.lax.slice_in_dim(ext, s, s + l_local, axis=1)
        hr = h[:, k, 0:1]
        hi = h[:, k, 1:2]
        out_r = out_r + xs[..., 0] * hr - xs[..., 1] * hi
        out_i = out_i + xs[..., 0] * hi + xs[..., 1] * hr
    return jnp.stack([out_r, out_i], axis=-1)
