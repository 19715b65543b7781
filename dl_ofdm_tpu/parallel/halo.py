"""Halo-exchange FIR over a device mesh (overlap-save across shards).

The reference processes each frame's waveform on one host with
`np.convolve(..., 'same')`.  When a long IQ time-block is sharded over a mesh
axis (the sequence-parallel analog for FIR channels, SURVEY.md section 5.7),
each shard needs `F-1` boundary samples from its neighbors to compute its
'same' window exactly.  The halos ride the ICI ring either via
`jax.lax.ppermute` (default — XLA collective) or via a Pallas
`make_async_remote_copy` DMA kernel (`exchange='dma'`, SURVEY §5.8's
optional variant: explicit RDMA over the ring, the building block for
overlapping the halo transfer with compute).  Global edges are zero-masked
to reproduce `np.convolve`'s zero-padded semantics bit-for-bit.

Layout: time axis sharded over `axis_name`; the FIR kernel (per batch row) is
replicated.  out[n] = sum_k h[k] * x[n + off - k] with off = (F-1)//2 for
'same' (any static off in [0, F-1] is supported, e.g. 0 for causal/MATLAB
filtering).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dma_ring_exchange(left_tail: jnp.ndarray, right_head: jnp.ndarray,
                       axis_name: str, n_dev: int, interpret: bool):
    """Exchange boundary slices with both ring neighbors via Pallas RDMA.

    Each device pushes `left_tail` (its last samples) to its RIGHT
    neighbor's recv_l buffer and `right_head` (its first samples) to its
    LEFT neighbor's recv_r buffer with `pltpu.make_async_remote_copy` —
    one async push per direction, waits on the receive semaphores
    (SNIPPETS.md [1] pattern).  Returns (recv_l, recv_r).  Off-TPU the
    kernel runs in interpreter mode (exercised on the virtual CPU mesh).
    """
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lt_ref, rh_ref, recv_l_ref, recv_r_ref,
               send_r, recv_l_sem, send_l, recv_r_sem):
        me = lax.axis_index(axis_name)
        right = lax.rem(me + 1, n_dev)
        left = lax.rem(me - 1 + n_dev, n_dev)
        # my right edge -> right neighbor's left halo
        op_r = pltpu.make_async_remote_copy(
            src_ref=lt_ref, dst_ref=recv_l_ref,
            send_sem=send_r, recv_sem=recv_l_sem,
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
        # my left edge -> left neighbor's right halo
        op_l = pltpu.make_async_remote_copy(
            src_ref=rh_ref, dst_ref=recv_r_ref,
            send_sem=send_l, recv_sem=recv_r_sem,
            device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)
        op_r.start()
        op_l.start()
        op_r.wait()
        op_l.wait()

    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(left_tail.shape, left_tail.dtype),
                   jax.ShapeDtypeStruct(right_head.shape, right_head.dtype)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 4,
        interpret=interpret,
    )(left_tail, right_head)


def halo_fir_same_iq(x: jnp.ndarray, h: jnp.ndarray, offset: int,
                     axis_name: str, exchange: str = "ppermute") -> jnp.ndarray:
    """Sharded 'same' FIR; call inside shard_map with the time axis sharded.

    Args:
      x: [B, L_local, 2] local shard of the waveform (time axis sharded).
      h: [B, F, 2] FIR kernels (replicated across the axis).
      offset: static alignment, (F_orig-1)//2 for np.convolve 'same'.
      axis_name: mesh axis the time dimension is sharded over.
      exchange: 'ppermute' (XLA collective) or 'dma' (Pallas
        make_async_remote_copy ring RDMA; interpreter mode off-TPU).

    Returns [B, L_local, 2].
    """
    f = h.shape[1]
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    halo_l = f - 1 - offset   # samples needed from the left neighbor
    halo_r = offset           # samples needed from the right neighbor

    if exchange == "dma" and (halo_l > 0 or halo_r > 0):
        # DMA shapes are static: exchange max(halo, 1)-sized edges both ways
        hl = max(halo_l, 1)
        hr = max(halo_r, 1)
        interpret = jax.default_backend() not in ("tpu", "axon")
        recv_l_full, recv_r_full = _dma_ring_exchange(
            x[:, -hl:, :], x[:, :hr, :], axis_name, n_dev, interpret)
        # hl/hr == halo when the halo is nonzero; the padded (size-1)
        # exchange of a zero-halo direction is simply unused below
        recv_l = recv_l_full if halo_l > 0 else None
        recv_r = recv_r_full if halo_r > 0 else None
    elif exchange == "ppermute":
        recv_l = recv_r = None
    else:
        raise ValueError(exchange)

    parts = []
    if halo_l > 0:
        # receive the tail of the left neighbor (shard i gets from i-1)
        if recv_l is None:
            left_tail = x[:, -halo_l:, :]
            recv_l = jax.lax.ppermute(
                left_tail, axis_name,
                perm=[(i, (i + 1) % n_dev) for i in range(n_dev)])
        recv_l = jnp.where(idx == 0, jnp.zeros_like(recv_l), recv_l)
        parts.append(recv_l)
    parts.append(x)
    if halo_r > 0:
        if recv_r is None:
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
