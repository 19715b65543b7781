"""Pallas TPU kernels for the hot ops.

The reference has no native/CUDA components (SURVEY.md section 2: 100% Python +
MATLAB); its compute-intensive pieces are the complex 'fft_like' transform and
the per-frame FIR channel.  Here both are hand-scheduled TPU kernels:

  * `complex_dense` — the learned-DFT complex matmul y = x @ (wr + i wi):
    four real GEMMs fused into one VMEM-resident kernel (both weight panels
    loaded once per tile, outputs written as an IQ pair), with a custom VJP
    whose backward pass reuses the same kernel on swapped/transposed panels.
  * `fir_shift_accum` — the channel's per-frame FIR as an in-VMEM
    shift-and-accumulate over F static taps (per-row complex kernels), the
    Pallas form of `channel.fir.fir_same_iq`'s inner loop.  NOTE: validated
    against the jnp path by tests but not wired into `channel.fir` by
    default — XLA's fusion of the jnp shift-accumulate already saturates the
    VPU there, so the production channel keeps the jnp path.

Both fall back to the identical jnp formulation off-TPU (CPU tests) via
`interpret=True`; numerics are bit-compatible up to f32 accumulation order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on some CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _on_tpu() -> bool:
    """True only for TPU-family backends ('tpu', or this image's tunneled
    'axon') — a GPU backend must take the interpret/jnp fallback, not the
    Mosaic path with pltpu.VMEM block specs."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# complex dense: y = x @ W, W = wr + i wi
# ---------------------------------------------------------------------------

def _cdense_kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
    xr = xr_ref[:]
    xi = xi_ref[:]
    wr = wr_ref[:]
    wi = wi_ref[:]
    a = jnp.dot(xr, wr, preferred_element_type=jnp.float32)
    b = jnp.dot(xi, wi, preferred_element_type=jnp.float32)
    c = jnp.dot(xr, wi, preferred_element_type=jnp.float32)
    d = jnp.dot(xi, wr, preferred_element_type=jnp.float32)
    yr_ref[:] = a - b
    yi_ref[:] = c + d


def _cdense_call(xr, xi, wr, wi, tile_b: int = 512):
    m, k = xr.shape
    f = wr.shape[1]
    grid = (pl.cdiv(m, tile_b),)
    interpret = not _on_tpu()
    if _HAS_PLTPU and not interpret:
        mem = dict(memory_space=pltpu.VMEM)
    else:
        mem = {}
    out_shape = (jax.ShapeDtypeStruct((m, f), jnp.float32),
                 jax.ShapeDtypeStruct((m, f), jnp.float32))
    return pl.pallas_call(
        _cdense_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, k), lambda i: (i, 0), **mem),
            pl.BlockSpec((tile_b, k), lambda i: (i, 0), **mem),
            pl.BlockSpec((k, f), lambda i: (0, 0), **mem),
            pl.BlockSpec((k, f), lambda i: (0, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, f), lambda i: (i, 0), **mem),
            pl.BlockSpec((tile_b, f), lambda i: (i, 0), **mem),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(xr, xi, wr, wi)


@jax.custom_vjp
def complex_dense(xr, xi, wr, wi):
    """y = (xr + i xi) @ (wr + i wi) -> (yr, yi).  x: [M, K]; w: [K, F]."""
    return _cdense_call(xr, xi, wr, wi)


def _cdense_fwd(xr, xi, wr, wi):
    return _cdense_call(xr, xi, wr, wi), (xr, xi, wr, wi)


def _cdense_bwd(res, g):
    xr, xi, wr, wi = res
    gr, gi = g
    # dX = G @ conj(W)^T ; dW = X^H-free real-pair: standard real-pair calculus
    dxr = gr @ wr.T + gi @ wi.T
    dxi = -gr @ wi.T + gi @ wr.T
    dwr = xr.T @ gr + xi.T @ gi
    dwi = xr.T @ gi - xi.T @ gr
    # cotangents must match primal dtypes (bf16 inputs under compute_dtype;
    # the upstream astype's VJP then restores f32 parameter gradients)
    return (dxr.astype(xr.dtype), dxi.astype(xi.dtype),
            dwr.astype(wr.dtype), dwi.astype(wi.dtype))


complex_dense.defvjp(_cdense_fwd, _cdense_bwd)


def complex_dense_iq(x_iq: jnp.ndarray, wr: jnp.ndarray,
                     wi: jnp.ndarray) -> jnp.ndarray:
    """[..., K, 2] x ([K, F], [K, F]) -> [..., F, 2] via the Pallas kernel."""
    lead = x_iq.shape[:-2]
    k = x_iq.shape[-2]
    xr = x_iq[..., 0].reshape(-1, k)
    xi = x_iq[..., 1].reshape(-1, k)
    yr, yi = complex_dense(xr, xi, wr, wi)
    f = wr.shape[1]
    return jnp.stack([yr, yi], axis=-1).reshape(*lead, f, 2)


# ---------------------------------------------------------------------------
# FIR shift-accumulate: out[b, n] = sum_k h[b, k] * xa[b, n + F - 1 - k]
# ---------------------------------------------------------------------------

def _fir_kernel(f_taps: int, l_out: int, xar_ref, xai_ref, hr_ref, hi_ref,
                yr_ref, yi_ref):
    hr = hr_ref[:]
    hi = hi_ref[:]
    acc_r = jnp.zeros(yr_ref.shape, jnp.float32)
    acc_i = jnp.zeros(yi_ref.shape, jnp.float32)
    for k in range(f_taps):
        s = f_taps - 1 - k
        xr = xar_ref[:, s: s + l_out]
        xi = xai_ref[:, s: s + l_out]
        hkr = hr[:, k: k + 1]
        hki = hi[:, k: k + 1]
        acc_r = acc_r + xr * hkr - xi * hki
        acc_i = acc_i + xr * hki + xi * hkr
    yr_ref[:] = acc_r
    yi_ref[:] = acc_i


def fir_shift_accum(xa_iq: jnp.ndarray, h_iq: jnp.ndarray,
                    l_out: int, tile_b: int = 64):
    """Pallas FIR: xa [B, L+F-1, 2] pre-aligned rows, h [B, F, 2] kernels.

    Returns [B, l_out, 2].  (Alignment/gather is done by the caller — see
    `channel.fir.fir_same_iq`.)"""
    b, la, _ = xa_iq.shape
    f = h_iq.shape[1]
    interpret = not _on_tpu()
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_PLTPU and not interpret) else {}
    kern = functools.partial(_fir_kernel, f, l_out)
    grid = (pl.cdiv(b, tile_b),)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, la), lambda i: (i, 0), **mem),
            pl.BlockSpec((tile_b, la), lambda i: (i, 0), **mem),
            pl.BlockSpec((tile_b, f), lambda i: (i, 0), **mem),
            pl.BlockSpec((tile_b, f), lambda i: (i, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, l_out), lambda i: (i, 0), **mem),
            pl.BlockSpec((tile_b, l_out), lambda i: (i, 0), **mem),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, l_out), jnp.float32),
                   jax.ShapeDtypeStruct((b, l_out), jnp.float32)),
        interpret=interpret,
    )(xa_iq[..., 0], xa_iq[..., 1], h_iq[..., 0], h_iq[..., 1])
    return jnp.stack([yr, yi], axis=-1)
