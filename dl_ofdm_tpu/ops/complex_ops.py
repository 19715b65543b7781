"""Complex-valued NN layers as (re, im) real-pair algebra -> MXU matmuls.

TPU-first re-design of the reference complex-op library (`dev/py/complex.py`).
The key structural insight: every "(1, K) complex convolution" in the reference
models operates over an axis of size 1 or with 'valid' K-over-K extent, so only
one kernel tap ever touches data — each such layer IS a complex dense transform
K -> F (the learned-DFT). Here they are implemented directly as complex
matmuls ([.., K] x [K, F] in four real GEMMs), which is the native MXU shape,
instead of the reference's conv3d contortion (`complex.py:140-196`).

Layer modes mirror the reference's exact/approximate ablation family:
  * mode='exact'   — true complex arithmetic (layers_conv2d_complex intent);
  * mode='vector'  — unconstrained 2x2 real mixing of (re, im)
                     (layers_conv2d_vector, `complex.py:199-255`);
  * mode='streams' — independent real maps for re and im streams
                     (layers_conv2d_streams / layers_dense_streams,
                     `complex.py:258-356`).

`recombine` selects the imaginary-part sign convention for 'exact' mode:
  * 'true'      — im = re*wi + im*wr (mathematically correct complex product;
                  can represent the exact DFT);
  * 'reference' — im = re*wi - im*wr, reproducing the reference's recombination
                  `conv_im = conv[1] - conv[2]` (`complex.py:187-188`) — a
                  sign quirk that yields the family [[a,-b],[b,-a]] instead of
                  [[a,-b],[b,a]]; kept selectable for ablation parity.

All layers take and return IQ-last real tensors [..., 2].
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# Optionally route exact-mode ComplexDense through the fused Pallas kernel
# (ops/pallas_kernels.py).  Default is OFF everywhere: under honest d2h-fenced
# timing (utils/timing.py — the axon backend's block_until_ready does not
# actually fence, which inflated earlier "1.6x fwd" readings) the XLA lowering
# is 3.5x FASTER forward (0.30 vs 1.06 ms @2340 frames) and ~25% faster per
# train step than the hand kernel at the nfft=64 sizes: four [B,80]x[80,F]
# GEMMs are too small for a custom kernel to beat XLA's fusion, and the
# custom_vjp breaks backward fusion.  Override globally with
# `set_use_pallas(True/False)` or per-layer with `use_pallas=` (A/B:
# scripts/pallas_toggle_bench.py).
_USE_PALLAS_DEFAULT = None


def set_use_pallas(enabled: bool | None) -> None:
    global _USE_PALLAS_DEFAULT
    _USE_PALLAS_DEFAULT = None if enabled is None else bool(enabled)


def _default_use_pallas() -> bool:
    if _USE_PALLAS_DEFAULT is not None:
        return _USE_PALLAS_DEFAULT
    return False


def _pallas_fits(k: int, f: int, tile_b: int = 512, itemsize: int = 4) -> bool:
    """Scoped-VMEM guard for the fused kernel: both weight panels are
    VMEM-resident (and may be double-buffered by Mosaic) plus the IO tiles.
    Large-nfft LTE grids (e.g. K=1280, F=1024 at nfft=2048) exceed the 16MB
    scoped limit — fall back to the XLA lowering there; the fused kernel's
    win is the small-grid regime where HBM traffic dominates anyway.
    bf16 inputs (compute_dtype) halve the working set and double the reach."""
    return (k * f + tile_b * (k + f)) * 2 * 2 * itemsize <= 12 * 2**20


# canonical complex-pair primitives live in ops.cfloat; aliased here so the
# layer module's public names resolve to ONE implementation
from dl_ofdm_tpu.ops.cfloat import (cmul_iq as complex_mul,          # noqa: E402
                                    from_complex as complex_to_iq,
                                    to_complex as iq_to_complex)


class ComplexDense(nn.Module):
    """Complex linear transform on the second-to-last axis: [..., K, 2] -> [..., F, 2].

    This is the MXU-native realization of the reference's learned-DFT layer
    ('fft_like' complex conv, `dev/py/model.py:1245-1264`) and of the
    to/from-frequency-domain convs in the equalizer zoo
    (`dev/py/model.py:377-379,442`).
    """

    features: int
    mode: str = "exact"            # exact | vector | streams
    recombine: str = "true"        # true | reference  (exact mode only)
    use_bias: bool = True
    use_pallas: bool | None = None  # None -> module-level default
    compute_dtype: str | None = None  # e.g. 'bfloat16': GEMM inputs cast down
                                      # (params stay f32, f32 accumulation) —
                                      # halves HBM traffic on the memory-bound
                                      # forward path; MXU natively multiplies
                                      # in bf16 either way.

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != 2:
            raise ValueError("ComplexDense expects IQ-last input [..., K, 2]")
        k = x.shape[-2]
        f = self.features
        init = nn.initializers.lecun_normal()
        use_pallas = (_default_use_pallas() if self.use_pallas is None
                      else self.use_pallas)
        cd = (jnp.dtype(self.compute_dtype)
              if self.compute_dtype is not None else None)

        def mm(a, b):
            if cd is None:
                return a @ b
            return jnp.matmul(a.astype(cd), b.astype(cd),
                              preferred_element_type=jnp.float32)

        xr, xi = x[..., 0], x[..., 1]
        if self.mode == "exact":
            wr = self.param("wr", init, (k, f))
            wi = self.param("wi", init, (k, f))
            cd_ok = cd is None or cd == jnp.bfloat16
            if (use_pallas and self.recombine == "true" and cd_ok
                    and _pallas_fits(k, f,
                                     itemsize=2 if cd is not None else 4)):
                from dl_ofdm_tpu.ops.pallas_kernels import complex_dense_iq
                if cd is None:
                    y = complex_dense_iq(x, wr, wi)
                else:
                    # bf16 GEMM inputs, f32 accumulation inside the kernel —
                    # same numerics contract as the mm() path below
                    y = complex_dense_iq(x.astype(cd), wr.astype(cd),
                                         wi.astype(cd))
                if self.use_bias:
                    br = self.param("br", nn.initializers.zeros, (f,))
                    bi = self.param("bi", nn.initializers.zeros, (f,))
                    y = y + jnp.stack([br, bi], axis=-1)
                return y
            yr = mm(xr, wr) - mm(xi, wi)
            if self.recombine == "true":
                yi = mm(xr, wi) + mm(xi, wr)
            elif self.recombine == "reference":
                yi = mm(xr, wi) - mm(xi, wr)
            else:
                raise ValueError(f"Unknown recombine {self.recombine!r}")
            if self.use_bias:
                if self.recombine == "reference":
                    # conv3d shares one bias per channel across IQ depth; after
                    # the reference recombination this collapses to +-b.
                    b = self.param("b", nn.initializers.zeros, (f,))
                    yr, yi = yr + b, yi - b
                else:
                    br = self.param("br", nn.initializers.zeros, (f,))
                    bi = self.param("bi", nn.initializers.zeros, (f,))
                    yr, yi = yr + br, yi + bi
        elif self.mode == "vector":
            # unconstrained real map [K, 2] -> [F, 2]
            w = self.param("w", init, (2 * k, 2 * f))
            flat = jnp.concatenate([xr, xi], axis=-1) @ w
            yr, yi = flat[..., :f], flat[..., f:]
            if self.use_bias:
                b = self.param("b", nn.initializers.zeros, (2 * f,))
                yr, yi = yr + b[:f], yi + b[f:]
        elif self.mode == "streams":
            wr = self.param("wr", init, (k, f))
            wi = self.param("wi", init, (k, f))
            yr, yi = xr @ wr, xi @ wi
            if self.use_bias:
                br = self.param("br", nn.initializers.zeros, (f,))
                bi = self.param("bi", nn.initializers.zeros, (f,))
                yr, yi = yr + br, yi + bi
        else:
            raise ValueError(f"Unknown mode {self.mode!r}")
        return jnp.stack([yr, yi], axis=-1)


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, padding: str) -> jnp.ndarray:
    """Real 2D conv, NHWC x HWIO -> NHWC."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding.upper(),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ComplexConvTranspose2d(nn.Module):
    """Complex transposed 2D convolution — parity with the reference's
    `layers_conv1d_transpose_complex` / `layers_conv2d_transpose_complex`
    (`dev/py/complex.py:95-136,359-415`, unused by the main models but part
    of the op library surface).  Input [B, S, K, C, 2] or [B, S, K, 2]."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "same"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 4:
            x = x[:, :, :, None, :]
            squeeze = True
        else:
            squeeze = False
        b, s, k, c, _ = x.shape
        f = self.features
        kh, kw = self.kernel
        init = nn.initializers.lecun_normal()
        wr = self.param("wr", init, (kh, kw, c, f))
        wi = self.param("wi", init, (kh, kw, c, f))

        def tconv(v, w):
            return jax.lax.conv_transpose(
                v, w, strides=self.strides, padding=self.padding.upper(),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        xr, xi = x[..., 0].reshape(b, s, k, c), x[..., 1].reshape(b, s, k, c)
        yr = tconv(xr, wr) - tconv(xi, wi)
        yi = tconv(xr, wi) + tconv(xi, wr)
        if self.use_bias:
            yr = yr + self.param("br", nn.initializers.zeros, (f,))
            yi = yi + self.param("bi", nn.initializers.zeros, (f,))
        out = jnp.stack([yr, yi], axis=-1)
        if squeeze and f == 1:
            out = out[:, :, :, 0, :]
        return out


class ComplexConv2d(nn.Module):
    """Genuine complex 2D convolution over (symbol, subcarrier) axes.

    Used for the reference's (n_sym, K) 'same' refinement filters
    (`dev/py/model.py:426,564`), the only layers where an actual spatial
    convolution (not a dense transform) occurs.  Input [B, S, K, C, 2].
    """

    features: int
    kernel: Tuple[int, int]
    padding: str = "same"
    mode: str = "exact"
    recombine: str = "true"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 4:            # [B, S, K, 2] -> single channel
            x = x[:, :, :, None, :]
            squeeze = True
        else:
            squeeze = False
        b, s, k, c, _ = x.shape
        f = self.features
        kh, kw = self.kernel
        init = nn.initializers.lecun_normal()
        xr, xi = x[..., 0].reshape(b, s, k, c), x[..., 1].reshape(b, s, k, c)
        if self.mode == "exact":
            wr = self.param("wr", init, (kh, kw, c, f))
            wi = self.param("wi", init, (kh, kw, c, f))
            yr = _conv2d(xr, wr, self.padding) - _conv2d(xi, wi, self.padding)
            if self.recombine == "true":
                yi = _conv2d(xr, wi, self.padding) + _conv2d(xi, wr, self.padding)
            else:
                yi = _conv2d(xr, wi, self.padding) - _conv2d(xi, wr, self.padding)
            if self.use_bias:
                if self.recombine == "reference":
                    bias = self.param("b", nn.initializers.zeros, (f,))
                    yr, yi = yr + bias, yi - bias
                else:
                    br = self.param("br", nn.initializers.zeros, (f,))
                    bi = self.param("bi", nn.initializers.zeros, (f,))
                    yr, yi = yr + br, yi + bi
        elif self.mode == "vector":
            w = self.param("w", init, (kh, kw, 2 * c, 2 * f))
            stacked = jnp.concatenate([xr, xi], axis=-1)
            y = _conv2d(stacked, w, self.padding)
            if self.use_bias:
                y = y + self.param("b", nn.initializers.zeros, (2 * f,))
            yr, yi = y[..., :f], y[..., f:]
        elif self.mode == "streams":
            wr = self.param("wr", init, (kh, kw, c, f))
            wi = self.param("wi", init, (kh, kw, c, f))
            yr, yi = _conv2d(xr, wr, self.padding), _conv2d(xi, wi, self.padding)
            if self.use_bias:
                br = self.param("br", nn.initializers.zeros, (f,))
                bi = self.param("bi", nn.initializers.zeros, (f,))
                yr, yi = yr + br, yi + bi
        else:
            raise ValueError(f"Unknown mode {self.mode!r}")
        out = jnp.stack([yr, yi], axis=-1)  # [B, S', K', F, 2]
        if squeeze and f == 1:
            out = out[:, :, :, 0, :]
        return out
