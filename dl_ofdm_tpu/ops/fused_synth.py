"""Fused Pallas synthesize megakernel: bits -> OFDM TX -> FIR fading -> AWGN
-> batch-norm, one VMEM-resident pass (plus a fused XLA epilogue).

Why: the train step's data plane (reference semantics: `dev/py/util.py:25-34`
bits, `dev/py/ofdm.py:328-380` TX, `dev/py/radio.py:424-506` fading,
`dev/py/radio.py:513-526` AWGN, `dev/py/ofdmreceiver_np.py:128-129` input
batch-norm) costs ~2.3 ms of the 3.8 ms step at 9362 frames when expressed as
separate XLA ops (scripts/step_breakdown_bench.py) — dominated by generator
and elementwise HBM passes, not FLOPs.  Here the whole chain runs in VMEM with
the TPU's hardware PRNG (`pltpu.prng_random_bits`), touching HBM only for the
final outputs.

Structure (the batch statistics force a second pass; it stays in XLA):
  * Kernel (grid over frame blocks): draw symbol indices (hardware RNG),
    per-symbol constant GEMMs (placement+IDFT+CP = `ofdm.tx._symbol_tx_operator`
    semantics) stored straight into the zero-padded FIR scratch plane, draw
    Rayleigh taps (Box-Muller), synthesize the per-frame FIR kernel (gains x
    fractional-delay alpha matrix) and convolve 'same' in VMEM, draw the
    AWGN, and write: the faded signal y, the noise n, the symbol indices,
    optionally the ground-truth channel DFT, and 10 per-position partial
    sums (y, y^2, n, n^2, y*n per IQ plane) — everything normalization needs.
  * XLA combines the partials into the exact batch moments of
    a*y + n (a = 1/sqrt(mean |y|^2), the AWGN normalizer) and applies
    rx = ((a*y + n) - mean) * rsqrt(var + eps) / sqrt(2) — exactly
    `ops.norms.batch_norm_ref` on the noisy signal — as ONE fused
    elementwise epilogue (cheaper than a second Pallas pass re-deriving the
    noise: measured 0.21 ms of HBM vs ~0.4 ms of regenerated Box-Muller).

Channel mixes: static per-frame profile cycling (reference 'mixRayleigh' /
'mixAll', `dev/py/radio.py:450-490`) is supported by choosing the block size
as a multiple of the cycle length P, so every block sees the same
row -> profile pattern and all per-profile parameters bake into per-row
constants.  Profiles have different FIR lengths and 'same' alignments; the
kernel unifies them by PRE-SHIFTING each profile's fractional-delay matrix
so one common alignment offset serves every row (a time shift of the kernel
equals a column shift of alpha).  AWGN frames inside 'mixAll' are a baked
delta kernel (`gbias`) with zeroed tap gains.

Doppler (mobile) frames: the kernel evaluates the Jakes sum-of-sinusoids
per OFDM symbol (`dev/py/radio.py:387-422` semantics, shared formula with
`channel/doppler.py`), synthesizes per-symbol FIR kernels, and convolves
with the reference's per-symbol window (n_taps look-back history, zero
future — `channel/fir.py::fir_per_symbol_iq` semantics, expressed here as
per-tap static masks in the unified offset coordinates).  Which frames take
the Doppler path is a static cycle (`dop_cycle`, period lcm(P, 3|4) from
`dev/py/radio.py:460,477`), so the block size is chosen divisible by the
cycle and the selection bakes into per-row 0/1 constants.  Ground-truth H
becomes per-symbol ([B, S, nfft]) when any Doppler frame exists.

Exactness: identical math to the jnp path except (a) the PRNG streams (TPU
hardware PRNG + Box-Muller instead of threefry + inverse-CDF: same
distributions, different draws — training sees statistically identical data)
and (b) the noise is synthesized in f32 rather than the jnp path's
bf16-quantized draws.  `emulate_fused_synthesize` runs the same math with
jax.random bits for CPU validation (the Mosaic PRNG returns zeros under the
Pallas interpreter, so the kernel itself is validated on hardware —
scripts/fused_synth_check.py).
"""
from __future__ import annotations

import dataclasses
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

from dl_ofdm_tpu.ofdm.plan import SubcarrierPlan

_SQRT_HALF = float(np.sqrt(0.5))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# static spec
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: hash by identity
class SynthSpec:                               # (jit static arg; ndarray fields)
    """Trace-time constants for the fused synthesize chain."""
    nbits: int
    nsymbol: int
    sps: int                 # samples per symbol (nfft + cp)
    nfft: int
    frame_size: int
    counts: tuple            # data subcarriers per OFDM symbol
    w_r: np.ndarray          # [frame_size, sps] per-data-SC IDFT rows
    w_i: np.ndarray
    bias_r: np.ndarray       # [nsymbol, sps] pilots' fixed waveform
    bias_i: np.ndarray
    table_r: tuple           # constellation (len 2^nbits)
    table_i: tuple
    # channel: P = n_classes profiles cycling frame i -> class i % P
    do_fir: bool
    n_classes: int
    taps: int                # max tap count (zero-padded)
    fir_u: int               # unified (pre-shifted) kernel length
    off_u: int               # unified 'same' alignment offset
    coeff_cls: np.ndarray    # [P, taps] tap weights (0 for passthrough rows)
    alpha_cls: np.ndarray    # [P, taps, fir_u] PRE-SHIFTED alpha matrices
    gbias_cls: np.ndarray    # [P, fir_u] baked delta kernel (passthrough)
    hb_r: np.ndarray         # [P, taps, nfft] alpha @ DFT (ground-truth H)
    hb_i: np.ndarray
    hbias_cls: np.ndarray    # [P, nfft] H of the baked delta (passthrough)
    # Doppler (all empty/zero when mobile=False)
    mobile: bool = False
    dop_cycle: np.ndarray = None   # [L] bool: frame i%L takes the Jakes path
    fd_cls: np.ndarray = None      # [P] Doppler shift per profile class (Hz)
    t_sym: float = 0.0             # OFDM symbol duration (s)
    jakes_base_r: np.ndarray = None  # [SS, taps] cos(n_vec + alpha_k)
    jakes_base_i: np.ndarray = None  # [SS, taps] cos(n_vec - alpha_k)
    block_override: int = 0        # nonzero: force the grid block size
                                   # (must be a multiple of lcm(8, P))

    @property
    def length(self) -> int:
        return self.nsymbol * self.sps

    @property
    def block(self) -> int:
        """Block size: multiple of the profile cycle and of the f32 sublane
        count.  64 covers P in {1, 2, 4, 8}; 8P otherwise (e.g. 80 for
        mixAll's 5-cycle).  Kept modest: Mosaic compile time explodes for
        bigger blocks (~190 s at 128 vs ~2 s at 64 for the same grid) — and
        hangs outright at 48 rows (measured: the mixRayleigh-mobile
        12-cycle at blk=48 never finished compiling), which is why the
        Doppler row mask/fd are STREAMED per-row inputs rather than baked
        block constants: the block never needs to cover the Doppler cycle.
        `block_override` forces a size anyway — with the persistent
        compilation cache (utils/cache.py) a multi-minute Mosaic compile is
        one-time per spec, so larger blocks become a throughput knob."""
        p = self.n_classes
        if self.block_override:
            if self.block_override % int(np.lcm(8, p)):
                raise ValueError(
                    f"block_override {self.block_override} must be a "
                    f"multiple of lcm(8, {p})")
            return self.block_override
        if 64 % p == 0:
            return 64
        blk = 8 * p
        while blk < 64:
            blk *= 2
        return blk


def build_synth_spec(plan: SubcarrierPlan, profiles=None,
                     nbits: int = 1, fd=None, dop_cycle=None) -> SynthSpec:
    """profiles: a `channel.profiles.TapProfile`, a sequence of them cycled
    per frame (None entries = AWGN passthrough frames), or None for a pure
    AWGN passthrough channel.

    Doppler: `fd` gives the per-profile-class Doppler shift (Hz; zeros =
    static) and `dop_cycle` the static frame-index cycle of bools selecting
    which frames take the Jakes path (RayleighChannel._frame_doppler_mask
    semantics, already ANDed with fd > 0.1 by the caller)."""
    from dl_ofdm_tpu.ofdm.constellation import _table_np
    from dl_ofdm_tpu.ofdm.tx import _symbol_tx_operator

    counts, w_sym_r, w_sym_i, bias = _symbol_tx_operator(plan)
    # flatten [S, Dmax, sps] -> row-per-data-symbol [frame_size, sps]
    rows_r, rows_i = [], []
    for s, c in enumerate(counts):
        rows_r.append(w_sym_r[s, :c])
        rows_i.append(w_sym_i[s, :c])
    w_r = np.concatenate(rows_r, axis=0).astype(np.float32)
    w_i = np.concatenate(rows_i, axis=0).astype(np.float32)
    table = _table_np(nbits)  # host-side: no complex dtype on this backend

    if profiles is None or not isinstance(profiles, (list, tuple)):
        profiles = [profiles]
    p_n = len(profiles)
    live = [p for p in profiles if p is not None]
    do_fir = bool(live)
    taps = max([p.n_taps for p in live], default=1)
    off_u = max([p.same_offset for p in live], default=0)
    fir_u = max([p.n_fir + off_u - p.same_offset for p in live], default=1)
    nfft = plan.nfft
    coeff = np.zeros((p_n, taps), np.float32)
    alpha = np.zeros((p_n, taps, fir_u), np.float32)
    gbias = np.zeros((p_n, fir_u), np.float32)
    hb_r = np.zeros((p_n, taps, nfft), np.float32)
    hb_i = np.zeros((p_n, taps, nfft), np.float32)
    hbias = np.zeros((p_n, nfft), np.float32)
    # H basis: fft of the UNSHIFTED kernel (ground-truth channel parity —
    # the pre-shift is an alignment artifact that must not leak into H)
    for c_idx, prof in enumerate(profiles):
        if prof is None:
            gbias[c_idx, off_u] = 1.0     # delta at the unified offset
            hbias[c_idx, :] = 1.0         # fft(delta) = 1
            continue
        t_n, f_n = prof.n_taps, prof.n_fir
        shift = off_u - prof.same_offset
        coeff[c_idx, :t_n] = prof.ch_coeff
        alpha[c_idx, :t_n, shift:shift + f_n] = prof.alpha_matrix
        n = np.arange(f_n)
        k = np.arange(nfft)
        dft = np.exp(-2j * np.pi * np.outer(n, k) / nfft)
        hb = prof.alpha_matrix.astype(np.complex64) @ dft    # [t_n, nfft]
        hb_r[c_idx, :t_n] = hb.real
        hb_i[c_idx, :t_n] = hb.imag
    mobile = fd is not None and bool(np.any(np.asarray(fd) > 0.1)) \
        and dop_cycle is not None and bool(np.any(dop_cycle))
    jb_r = jb_i = None
    fd_cls = None
    cyc = None
    t_sym = plan.samples_per_symbol / plan.sample_rate
    if mobile:
        from dl_ofdm_tpu.channel.doppler import SS
        k_vec = np.arange(1, taps + 1)
        n_vec = (np.arange(1, SS + 1).reshape(SS, 1) - 0.5) * np.pi / (4 * SS)
        alpha_k = k_vec * np.pi / (4 * SS)
        jb_r = np.cos(n_vec + alpha_k).astype(np.float32)   # [SS, taps]
        jb_i = np.cos(n_vec - alpha_k).astype(np.float32)
        fd_cls = np.asarray(fd, np.float32).reshape(p_n)
        cyc = np.asarray(dop_cycle, bool).reshape(-1)
    return SynthSpec(
        nbits=nbits, nsymbol=plan.nsymbol, sps=plan.samples_per_symbol,
        nfft=nfft, frame_size=plan.frame_size,
        counts=tuple(int(c) for c in counts),
        w_r=w_r, w_i=w_i,
        bias_r=bias[..., 0].astype(np.float32),
        bias_i=bias[..., 1].astype(np.float32),
        table_r=tuple(float(v) for v in table.real),
        table_i=tuple(float(v) for v in table.imag),
        do_fir=do_fir, n_classes=p_n, taps=taps, fir_u=fir_u, off_u=off_u,
        coeff_cls=coeff, alpha_cls=alpha, gbias_cls=gbias,
        hb_r=hb_r, hb_i=hb_i, hbias_cls=hbias,
        mobile=mobile, dop_cycle=cyc, fd_cls=fd_cls, t_sym=t_sym,
        jakes_base_r=jb_r, jakes_base_i=jb_i)


def _tile_rows(cls_arr: np.ndarray, blk: int) -> np.ndarray:
    """[P, ...] per-class constants -> [blk, ...] per-row (row r -> r % P)."""
    p = cls_arr.shape[0]
    assert blk % p == 0
    return np.tile(cls_arr, (blk // p,) + (1,) * (cls_arr.ndim - 1))


# ---------------------------------------------------------------------------
# shared math (kernel and jnp emulator run the same functions)
# ---------------------------------------------------------------------------


def _u01(bits_i32) -> jnp.ndarray:
    """int32 random bits -> uniform (0, 1) float32 (24-bit mantissa, never 0).

    Logical shift keeps the top 24 bits (always fits int32, so the int->f32
    cast is exact); Mosaic has no uint32->f32 cast, hence the i32 plumbing."""
    hi24 = jax.lax.shift_right_logical(bits_i32, 8)
    return hi24.astype(jnp.float32) * (2.0 ** -24) + 2.0 ** -25


def _stream_seed(seed_ref, stream):
    """Fold the per-block stream id into the second seed word (this backend's
    `tpu.prng_set_seed_32` takes at most two words).  Weyl-constant multiply
    keeps distinct streams far apart in seed space; int32 wrap is fine."""
    return seed_ref[1] ^ (stream * jnp.int32(-1640531527))  # 0x9E3779B9


def _box_muller(u1, u2):
    """Two independent N(0,1) planes from two uniform planes."""
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = (2.0 * np.pi) * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


def _symbols_from_idx(idx_f, spec: SynthSpec):
    """Constellation lookup without a gather: [blk, frame] f32 index ->
    (sym_r, sym_i).  BPSK is affine in the bit; higher orders accumulate
    2^nbits masked selects (VPU compares, no memory op)."""
    if spec.nbits == 1:
        t0r, t1r = spec.table_r
        t0i, t1i = spec.table_i
        return (t0r + idx_f * (t1r - t0r), t0i + idx_f * (t1i - t0i))
    sym_r = jnp.zeros_like(idx_f)
    sym_i = jnp.zeros_like(idx_f)
    for c in range(2 ** spec.nbits):
        hit = (idx_f == float(c))
        sym_r = jnp.where(hit, spec.table_r[c], sym_r)
        sym_i = jnp.where(hit, spec.table_i[c], sym_i)
    return sym_r, sym_i


def _tx_waveform(sym_r, sym_i, w_r, w_i, bias_r, bias_i, spec: SynthSpec):
    """Per-symbol constant GEMMs: [blk, frame_size] -> [blk, L] planes."""
    outs_r, outs_i = [], []
    start = 0
    for s, c in enumerate(spec.counts):
        sr = jax.lax.slice_in_dim(sym_r, start, start + c, axis=1)
        si = jax.lax.slice_in_dim(sym_i, start, start + c, axis=1)
        wr = jax.lax.slice_in_dim(w_r, start, start + c, axis=0)
        wi = jax.lax.slice_in_dim(w_i, start, start + c, axis=0)
        a = jnp.dot(sr, wr, preferred_element_type=jnp.float32)
        b = jnp.dot(si, wi, preferred_element_type=jnp.float32)
        cdot = jnp.dot(sr, wi, preferred_element_type=jnp.float32)
        d = jnp.dot(si, wr, preferred_element_type=jnp.float32)
        outs_r.append(a - b + bias_r[s])
        outs_i.append(cdot + d + bias_i[s])
        start += c
    return jnp.concatenate(outs_r, axis=1), jnp.concatenate(outs_i, axis=1)


def _tap_gt(zr, zi, coeff_rows, alpha_rows, gbias_rows, spec: SynthSpec):
    """Per-row FIR kernel: gt[b] = sum_t z[b,t]*coeff[b,t]*alpha[b,t,:] +
    gbias[b] (alpha pre-shifted to the unified offset; gbias is the baked
    AWGN-passthrough delta, real-only)."""
    gt_r = jnp.broadcast_to(gbias_rows, zr.shape[:1] + gbias_rows.shape[1:])
    gt_i = jnp.zeros_like(gt_r)
    for t in range(spec.taps):
        wrt = (zr[:, t:t + 1] * coeff_rows[:, t:t + 1])
        wit = (zi[:, t:t + 1] * coeff_rows[:, t:t + 1])
        gt_r = gt_r + wrt * alpha_rows[:, t, :]
        gt_i = gt_i + wit * alpha_rows[:, t, :]
    return gt_r, gt_i


def _tap_h(zr, zi, coeff_rows, hb_r, hb_i, hbias_rows, spec: SynthSpec):
    """Ground-truth channel DFT: h[b] = sum_t (z*coeff)[b,t] * hbasis[b,t,:]
    (complex x complex) + hbias (passthrough H=1)."""
    h_r = jnp.broadcast_to(hbias_rows, zr.shape[:1] + hbias_rows.shape[1:])
    h_i = jnp.zeros_like(h_r)
    for t in range(spec.taps):
        cr = zr[:, t:t + 1] * coeff_rows[:, t:t + 1]
        ci = zi[:, t:t + 1] * coeff_rows[:, t:t + 1]
        br = hb_r[:, t, :]
        bi = hb_i[:, t, :]
        h_r = h_r + cr * br - ci * bi
        h_i = h_i + cr * bi + ci * br
    return h_r, h_i


def _dop_row_arrays(spec: SynthSpec, n_frames: int, b_pad: int):
    """Per-row Doppler inputs streamed to the kernel like the SNR std:
    (dop [b_pad,1] 0/1, fd [b_pad,1] Hz).  Global-frame-index semantics
    (RayleighChannel._frame_doppler_mask); padded rows take the static path."""
    idx = np.arange(b_pad)
    cyc = spec.dop_cycle
    dop = cyc[idx % len(cyc)].astype(np.float32)
    dop[n_frames:] = 0.0
    fd = spec.fd_cls[idx % spec.n_classes].astype(np.float32) * dop
    return dop.reshape(b_pad, 1), fd.reshape(b_pad, 1)


def _sym_window_masks(spec: SynthSpec) -> np.ndarray:
    """[fir_u, sps] 0/1: the reference per-symbol window in unified-offset
    coordinates.  Output position m of a symbol reads x[m + off_u - k]; the
    read is valid iff -taps <= m + off_u - k < sps (n_taps look-back history,
    zero future — `channel/fir.py::fir_per_symbol_iq` semantics; the
    expression is invariant under the kernel pre-shift since both k and off
    shift together)."""
    m = np.arange(spec.sps)
    masks = np.zeros((spec.fir_u, spec.sps), np.float32)
    for k in range(spec.fir_u):
        r = m + spec.off_u - k
        masks[k] = ((r >= -spec.taps) & (r < spec.sps)).astype(np.float32)
    return masks


def _jakes_sym_gains(th_re, th_im, fvec_re, fvec_im, t_s: float,
                     taps: int):
    """Per-symbol Jakes gains from flat [B, SS*taps] phase/frequency planes:
    zck(t_s) = sqrt(1/SS) * sum_n cos(2*pi*t_s*f + theta) — exactly
    `channel/doppler.py::jakes_gains_from_phases` at one time point, reduced
    over the sinusoid axis by static slice accumulation (2-D ops only, the
    layout Mosaic lowers cleanly).  Returns (zr, zi) [B, taps]."""
    from dl_ofdm_tpu.channel.doppler import SS
    ar = jnp.cos((2 * np.pi * t_s) * fvec_re + th_re)
    ai = jnp.cos((2 * np.pi * t_s) * fvec_im + th_im)
    zr = jax.lax.slice_in_dim(ar, 0, taps, axis=1)
    zi = jax.lax.slice_in_dim(ai, 0, taps, axis=1)
    for n in range(1, SS):
        zr = zr + jax.lax.slice_in_dim(ar, n * taps, (n + 1) * taps, axis=1)
        zi = zi + jax.lax.slice_in_dim(ai, n * taps, (n + 1) * taps, axis=1)
    c1 = float(np.sqrt(1.0 / SS))
    return c1 * zr, c1 * zi


def _fir_sym_unified(x_r, x_i, gts_r, gts_i, masks, spec: SynthSpec):
    """Per-symbol windowed FIR in unified coordinates (emulator side).

    x planes [B, L] (unpadded), per-symbol kernels gts [B, S, fir_u],
    masks = `_sym_window_masks`.  Returns [B, L] planes."""
    l = spec.length
    p = spec.fir_u - 1
    xp_r = jnp.pad(x_r, ((0, 0), (p, p)))
    xp_i = jnp.pad(x_i, ((0, 0), (p, p)))
    segs_r, segs_i = [], []
    for s in range(spec.nsymbol):
        y_sr = jnp.zeros((x_r.shape[0], spec.sps), jnp.float32)
        y_si = jnp.zeros_like(y_sr)
        for k in range(spec.fir_u):
            pos = p + s * spec.sps + spec.off_u - k
            sr = jax.lax.slice_in_dim(xp_r, pos, pos + spec.sps, axis=1)
            si = jax.lax.slice_in_dim(xp_i, pos, pos + spec.sps, axis=1)
            hr = gts_r[:, s, k:k + 1]
            hi = gts_i[:, s, k:k + 1]
            mk = masks[k:k + 1, :]
            y_sr = y_sr + (sr * hr - si * hi) * mk
            y_si = y_si + (sr * hi + si * hr) * mk
        segs_r.append(y_sr)
        segs_i.append(y_si)
    return jnp.concatenate(segs_r, axis=1), jnp.concatenate(segs_i, axis=1)


def _fir_same(x_r, x_i, gt_r, gt_i, spec: SynthSpec):
    """np.convolve(x, gt, 'same') per row with the unified pre-shifted
    kernels: static shift-and-accumulate, out[t] = sum_k x[t+off_u-k]*g'[k]
    (`dev/py/radio.py:436` alignment, per-profile offsets folded into g')."""
    if not spec.do_fir:
        return x_r, x_i
    l = x_r.shape[1]
    p = spec.fir_u - 1
    xp_r = jnp.pad(x_r, ((0, 0), (p, p)))
    xp_i = jnp.pad(x_i, ((0, 0), (p, p)))
    out_r = jnp.zeros_like(x_r)
    out_i = jnp.zeros_like(x_i)
    for k in range(spec.fir_u):
        s = spec.off_u - k + p
        sr = jax.lax.slice_in_dim(xp_r, s, s + l, axis=1)
        si = jax.lax.slice_in_dim(xp_i, s, s + l, axis=1)
        hr = gt_r[:, k:k + 1]
        hi = gt_i[:, k:k + 1]
        out_r = out_r + sr * hr - si * hi
        out_i = out_i + sr * hi + si * hr
    return out_r, out_i


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _p1_kernel(spec: SynthSpec, blk: int, n_frames: int, want_h: bool,
               seed_ref, std_ref, wr_ref, wi_ref, br_ref, bi_ref,
               coeff_ref, alpha_ref, gbias_ref, hbr_ref, hbi_ref, hbias_ref,
               *refs):
    if spec.mobile:
        # const order: jakes bases + window masks (consts), then the
        # streamed per-row dop mask / fd planes (inputs after the consts)
        jbr_ref, jbi_ref, maskk_ref, dopm_ref, fdr_ref, *refs = refs
    if want_h:
        (idx_ref, yr_ref, yi_ref, nr_ref, ni_ref, hr_ref, hi_ref,
         stats_ref, xr_s, xi_s) = refs
    else:
        idx_ref, yr_ref, yi_ref, nr_ref, ni_ref, stats_ref, xr_s, xi_s = refs
    bid = pl.program_id(0)
    l = spec.length
    p = spec.fir_u - 1

    # --- bits + taps stream -------------------------------------------------
    pltpu.prng_seed(seed_ref[0], _stream_seed(seed_ref, 2 * bid))
    rb = pltpu.bitcast(pltpu.prng_random_bits((blk, spec.frame_size)),
                       jnp.int32)
    idx = rb & jnp.int32(2 ** spec.nbits - 1)
    idx_ref[:] = idx
    idx_f = idx.astype(jnp.float32)
    sym_r, sym_i = _symbols_from_idx(idx_f, spec)

    # TX straight into the zero-padded FIR scratch plane: per-symbol GEMM
    # segments are stored as computed, so no [blk, L] concat/pad copies stay
    # live (VMEM stack pressure bounds the block size).
    if p:
        xr_s[:, :p] = jnp.zeros((blk, p), jnp.float32)
        xi_s[:, :p] = jnp.zeros((blk, p), jnp.float32)
        xr_s[:, p + l:] = jnp.zeros((blk, xr_s.shape[1] - p - l), jnp.float32)
        xi_s[:, p + l:] = jnp.zeros((blk, xi_s.shape[1] - p - l), jnp.float32)
    start = 0
    for s, c in enumerate(spec.counts):
        sr = jax.lax.slice_in_dim(sym_r, start, start + c, axis=1)
        si = jax.lax.slice_in_dim(sym_i, start, start + c, axis=1)
        wr = wr_ref[start:start + c, :]
        wi = wi_ref[start:start + c, :]
        a = jnp.dot(sr, wr, preferred_element_type=jnp.float32)
        b = jnp.dot(si, wi, preferred_element_type=jnp.float32)
        cdot = jnp.dot(sr, wi, preferred_element_type=jnp.float32)
        d = jnp.dot(si, wr, preferred_element_type=jnp.float32)
        seg = p + s * spec.sps
        xr_s[:, seg:seg + spec.sps] = a - b + br_ref[s:s + 1, :]
        xi_s[:, seg:seg + spec.sps] = cdot + d + bi_ref[s:s + 1, :]
        start += c

    if spec.do_fir:
        u1 = _u01(pltpu.bitcast(
            pltpu.prng_random_bits((blk, spec.taps)), jnp.int32))
        u2 = _u01(pltpu.bitcast(
            pltpu.prng_random_bits((blk, spec.taps)), jnp.int32))
        g0, g1 = _box_muller(u1, u2)
        zr, zi = g0 * _SQRT_HALF, g1 * _SQRT_HALF   # CN(0,1) components
        # per-row FIR kernel (alpha/hb consts are [taps, blk, ...] so each
        # tap is a lead-indexed 2-D plane — the layout Mosaic lowers cleanly)
        coeff = coeff_ref[:]
        gt_r = jnp.broadcast_to(gbias_ref[:], (blk, spec.fir_u)) * 1.0
        gt_i = jnp.zeros((blk, spec.fir_u), jnp.float32)
        for t in range(spec.taps):
            wrt = zr[:, t:t + 1] * coeff[:, t:t + 1]
            wit = zi[:, t:t + 1] * coeff[:, t:t + 1]
            gt_r = gt_r + wrt * alpha_ref[t]
            gt_i = gt_i + wit * alpha_ref[t]
        if want_h:
            h_r = jnp.broadcast_to(hbias_ref[:], (blk, spec.nfft)) * 1.0
            h_i = jnp.zeros((blk, spec.nfft), jnp.float32)
            for t in range(spec.taps):
                cr = zr[:, t:t + 1] * coeff[:, t:t + 1]
                ci = zi[:, t:t + 1] * coeff[:, t:t + 1]
                h_r = h_r + cr * hbr_ref[t] - ci * hbi_ref[t]
                h_i = h_i + cr * hbi_ref[t] + ci * hbr_ref[t]
            if not spec.mobile:
                hr_ref[:] = h_r
                hi_ref[:] = h_i
        y_r = jnp.zeros((blk, l), jnp.float32)
        y_i = jnp.zeros((blk, l), jnp.float32)
        for k in range(spec.fir_u):
            s = spec.off_u - k + p
            sr = xr_s[:, s:s + l]
            si = xi_s[:, s:s + l]
            hr = gt_r[:, k:k + 1]
            hi = gt_i[:, k:k + 1]
            y_r = y_r + sr * hr - si * hi
            y_i = y_i + sr * hi + si * hr
        if not spec.mobile:
            yr_ref[:] = y_r
            yi_ref[:] = y_i
        else:
            # --- Doppler frames: per-symbol Jakes gains + windowed FIR -----
            # theta draws CONTINUE the taps stream (static draws above stay
            # bitwise identical to the non-mobile kernel)
            sstaps = spec.jakes_base_r.size
            thr = (2.0 * np.pi) * _u01(pltpu.bitcast(
                pltpu.prng_random_bits((blk, sstaps)), jnp.int32))
            thi = (2.0 * np.pi) * _u01(pltpu.bitcast(
                pltpu.prng_random_bits((blk, sstaps)), jnp.int32))
            dopm = dopm_ref[:]                       # [blk, 1] 0/1
            fvr = fdr_ref[:] * jbr_ref[:]            # [blk, sstaps]
            fvi = fdr_ref[:] * jbi_ref[:]
            for s in range(spec.nsymbol):
                zrs, zis = _jakes_sym_gains(thr, thi, fvr, fvi,
                                            s * spec.t_sym, spec.taps)
                # row select: Jakes gains on Doppler rows, static elsewhere
                zsr = dopm * zrs + (1.0 - dopm) * zr
                zsi = dopm * zis + (1.0 - dopm) * zi
                gt_sr = jnp.broadcast_to(gbias_ref[:], (blk, spec.fir_u)) * 1.0
                gt_si = jnp.zeros((blk, spec.fir_u), jnp.float32)
                for t in range(spec.taps):
                    wrt = zsr[:, t:t + 1] * coeff[:, t:t + 1]
                    wit = zsi[:, t:t + 1] * coeff[:, t:t + 1]
                    gt_sr = gt_sr + wrt * alpha_ref[t]
                    gt_si = gt_si + wit * alpha_ref[t]
                y_sr = jnp.zeros((blk, spec.sps), jnp.float32)
                y_si = jnp.zeros((blk, spec.sps), jnp.float32)
                for k in range(spec.fir_u):
                    pos = p + s * spec.sps + spec.off_u - k
                    sr = xr_s[:, pos:pos + spec.sps]
                    si = xi_s[:, pos:pos + spec.sps]
                    hr = gt_sr[:, k:k + 1]
                    hi = gt_si[:, k:k + 1]
                    mk = maskk_ref[k:k + 1, :]
                    y_sr = y_sr + (sr * hr - si * hi) * mk
                    y_si = y_si + (sr * hi + si * hr) * mk
                seg = s * spec.sps
                ysl = y_r[:, seg:seg + spec.sps]
                yil = y_i[:, seg:seg + spec.sps]
                yr_ref[:, seg:seg + spec.sps] = dopm * y_sr + (1 - dopm) * ysl
                yi_ref[:, seg:seg + spec.sps] = dopm * y_si + (1 - dopm) * yil
                if want_h:
                    h_sr = jnp.broadcast_to(hbias_ref[:],
                                            (blk, spec.nfft)) * 1.0
                    h_si = jnp.zeros((blk, spec.nfft), jnp.float32)
                    for t in range(spec.taps):
                        cr = zsr[:, t:t + 1] * coeff[:, t:t + 1]
                        ci = zsi[:, t:t + 1] * coeff[:, t:t + 1]
                        h_sr = h_sr + cr * hbr_ref[t] - ci * hbi_ref[t]
                        h_si = h_si + cr * hbi_ref[t] + ci * hbr_ref[t]
                    hseg = s * spec.nfft
                    hr_ref[:, hseg:hseg + spec.nfft] = \
                        dopm * h_sr + (1 - dopm) * h_r
                    hi_ref[:, hseg:hseg + spec.nfft] = \
                        dopm * h_si + (1 - dopm) * h_i
            y_r = yr_ref[:]                          # selected planes for
            y_i = yi_ref[:]                          # the batch statistics
    else:
        y_r = xr_s[:, p:p + l]
        y_i = xi_s[:, p:p + l]
        if want_h:
            hr_ref[:] = jnp.ones((blk, spec.nfft), jnp.float32)
            hi_ref[:] = jnp.zeros((blk, spec.nfft), jnp.float32)
        yr_ref[:] = y_r
        yi_ref[:] = y_i

    # --- noise stream --------------------------------------------------------
    pltpu.prng_seed(seed_ref[0], _stream_seed(seed_ref, 2 * bid + 1))
    nu1 = _u01(pltpu.bitcast(pltpu.prng_random_bits((blk, l)), jnp.int32))
    nu2 = _u01(pltpu.bitcast(pltpu.prng_random_bits((blk, l)), jnp.int32))
    un_r, un_i = _box_muller(nu1, nu2)
    std = std_ref[:]                                 # [blk, 1]
    n_r = std * un_r
    n_i = std * un_i
    nr_ref[:] = n_r
    ni_ref[:] = n_i

    # --- masked per-position partial sums -----------------------------------
    row = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    mask = ((bid * blk + row) < n_frames).astype(jnp.float32)
    yr_m = y_r * mask
    yi_m = y_i * mask
    nr_m = n_r * mask
    ni_m = n_i * mask

    def put(k, v):  # per-row 2-D stores, products built inline so each
        stats_ref[0, k:k + 1, :] = jnp.sum(v, axis=0, keepdims=True)

    put(0, yr_m)                 # (Mosaic can't lower a 10-way concat, and
    put(1, yi_m)                 # a tuple of all products would keep ~10
    put(2, yr_m * y_r)           # extra [blk, L] planes live at once —
    put(3, yi_m * y_i)           # VMEM stack pressure)
    put(4, nr_m)
    put(5, ni_m)
    put(6, nr_m * n_r)
    put(7, ni_m * n_i)
    put(8, yr_m * n_r)
    put(9, yi_m * n_i)


# ---------------------------------------------------------------------------
# host-side driver (jit-traceable)
# ---------------------------------------------------------------------------


def _combine_stats(sums, n_frames, eps=1e-9):
    """[10, L] partial sums -> (a, c [6, L], noise_power, sig_pwr)."""
    syr, syi, syyr, syyi, snr_, sni, snnr, snni, synr, syni = [
        sums[i] for i in range(10)]
    count = n_frames * sums.shape[-1]
    sig_pwr = (jnp.sum(syyr) + jnp.sum(syyi)) / count
    a = jax.lax.rsqrt(sig_pwr)
    noise_power = (jnp.sum(snnr) + jnp.sum(snni)) / count

    def plane(sy, syy, sn, snn, syn):
        m = (a * sy + sn) / n_frames
        ex2 = (a * a * syy + 2.0 * a * syn + snn) / n_frames
        v = ex2 - m * m
        scale = jax.lax.rsqrt(v + eps) / np.sqrt(2.0)
        return a * scale, scale, m * scale

    c1r, c2r, c3r = plane(syr, syyr, snr_, snnr, synr)
    c1i, c2i, c3i = plane(syi, syyi, sni, snni, syni)
    c = jnp.stack([c1r, c2r, c3r, c1i, c2i, c3i])
    return a, c, noise_power, sig_pwr


def _bits_from_idx(idx, nbits):
    shifts = jnp.arange(nbits - 1, -1, -1, dtype=jnp.int32)
    return ((idx[..., None] >> shifts) & 1).astype(jnp.int32)


def _key_seeds(key: jax.Array) -> jnp.ndarray:
    """PRNG key (typed or raw uint32 pair) -> int32 [2] seed words."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    return jax.lax.bitcast_convert_type(
        data.reshape(-1)[:2].astype(jnp.uint32), jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def fused_synthesize(spec: SynthSpec, n_frames: int, key: jax.Array,
                     snr_db: jnp.ndarray, want_h: bool = False,
                     debug: bool = False, raw: bool = False):
    """Returns (bits [B, frame, nbits] i32, rx_in [B, S, sps, 2], noise_pwr
    [, h_freq [B, S, nfft, 2] when want_h]).

    `debug=True` additionally appends the PRE-normalization signal and noise
    planes ((y_r, y_i, n_r, n_i), each [B, L]) — the kernel writes them to
    HBM anyway for the epilogue; diagnostics (scripts/doppler_rootcause.py)
    need them because the per-position batch-norm affine is not invertible
    from the outputs alone.  Mirrors `emulate_fused_synthesize(debug=True)`.

    Drop-in for the train path of `Trainer.synthesize` (no norm groups)."""
    if not (_HAS_PLTPU and _on_tpu()):
        raise RuntimeError("fused_synthesize requires a TPU backend; "
                           "use emulate_fused_synthesize off-TPU")
    l = spec.length
    blk = spec.block
    seeds = _key_seeds(key)
    std = (_SQRT_HALF * 10.0 ** (-snr_db.reshape(-1).astype(jnp.float32)
                                 / 20.0)).reshape(n_frames, 1)
    grid = (pl.cdiv(n_frames, blk),)
    n_blocks = grid[0]
    # all kernel I/O is padded to whole blocks (partial blocks crash the
    # Mosaic compile on this backend, and OOB padding garbage could be NaN,
    # poisoning the masked statistics); padded rows carry real generated
    # data, are excluded from the statistics by the in-kernel row mask, and
    # are sliced off the returned arrays (the slice fuses into the epilogue)
    b_pad = n_blocks * blk
    std = jnp.pad(std, ((0, b_pad - n_frames), (0, 0)))
    mem = dict(memory_space=pltpu.VMEM)

    consts = [jnp.asarray(spec.w_r), jnp.asarray(spec.w_i),
              jnp.asarray(spec.bias_r), jnp.asarray(spec.bias_i),
              jnp.asarray(_tile_rows(spec.coeff_cls, blk)),
              # [taps, blk, ...] so each tap indexes a 2-D plane in-kernel
              jnp.asarray(_tile_rows(spec.alpha_cls, blk).transpose(1, 0, 2)),
              jnp.asarray(_tile_rows(spec.gbias_cls, blk)),
              jnp.asarray(_tile_rows(spec.hb_r, blk).transpose(1, 0, 2)),
              jnp.asarray(_tile_rows(spec.hb_i, blk).transpose(1, 0, 2)),
              jnp.asarray(_tile_rows(spec.hbias_cls, blk))]
    row_inputs = []
    row_specs = []
    if spec.mobile:
        sstaps = spec.jakes_base_r.size
        consts += [jnp.asarray(spec.jakes_base_r.reshape(1, sstaps)),
                   jnp.asarray(spec.jakes_base_i.reshape(1, sstaps)),
                   jnp.asarray(_sym_window_masks(spec))]
        dopm, fdrow = _dop_row_arrays(spec, n_frames, b_pad)
        row_inputs = [jnp.asarray(dopm), jnp.asarray(fdrow)]
        row_specs = [pl.BlockSpec((blk, 1), lambda i: (i, 0), **mem),
                     pl.BlockSpec((blk, 1), lambda i: (i, 0), **mem)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd, **mem)
        for c in consts]

    out_specs = [
        pl.BlockSpec((blk, spec.frame_size), lambda i: (i, 0), **mem),
        pl.BlockSpec((blk, l), lambda i: (i, 0), **mem),
        pl.BlockSpec((blk, l), lambda i: (i, 0), **mem),
        pl.BlockSpec((blk, l), lambda i: (i, 0), **mem),
        pl.BlockSpec((blk, l), lambda i: (i, 0), **mem),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b_pad, spec.frame_size), jnp.int32),
        jax.ShapeDtypeStruct((b_pad, l), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, l), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, l), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, l), jnp.float32),
    ]
    if want_h:
        # per-symbol ground truth when Doppler frames exist, else one H per
        # frame broadcast over symbols in the epilogue
        h_w = spec.nsymbol * spec.nfft if spec.mobile else spec.nfft
        out_specs += [pl.BlockSpec((blk, h_w), lambda i: (i, 0), **mem),
                      pl.BlockSpec((blk, h_w), lambda i: (i, 0), **mem)]
        out_shape += [jax.ShapeDtypeStruct((b_pad, h_w), jnp.float32),
                      jax.ShapeDtypeStruct((b_pad, h_w), jnp.float32)]
    out_specs.append(pl.BlockSpec((1, 10, l), lambda i: (i, 0, 0), **mem))
    out_shape.append(jax.ShapeDtypeStruct((n_blocks, 10, l), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_p1_kernel, spec, blk, n_frames, want_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), **mem),
        ] + const_specs + row_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((blk, l + 2 * (spec.fir_u - 1) + 2), jnp.float32),
            pltpu.VMEM((blk, l + 2 * (spec.fir_u - 1) + 2), jnp.float32),
        ],
    )(seeds, std, *consts, *row_inputs)
    if want_h:
        idx, yr, yi, nr, ni, hr, hi, stats = outs
    else:
        idx, yr, yi, nr, ni, stats = outs

    if raw:
        # chaining form for the fused model-grad kernel
        # (`ops/fused_model.py`, fuse_norm=True): PADDED raw signal/noise
        # planes + idx grid + per-block stats; the caller derives the affine
        # via `_combine_stats` and the downstream kernel applies it in VMEM
        # (padded rows carry real generated data and are masked there by
        # row index >= n_frames).
        return idx, yr, yi, nr, ni, stats

    sums = stats.sum(axis=0)
    _, c, noise_power, _ = _combine_stats(sums, n_frames)

    # fused XLA epilogue: the per-position affine normalize (awgn normalize +
    # batch-norm folded by _combine_stats) + IQ stack, one elementwise pass
    rxr = yr[:n_frames] * c[0] + nr[:n_frames] * c[1] - c[2]
    rxi = yi[:n_frames] * c[3] + ni[:n_frames] * c[4] - c[5]
    rx = jnp.stack([rxr, rxi], axis=-1).reshape(
        n_frames, spec.nsymbol, spec.sps, 2)
    bits = _bits_from_idx(idx[:n_frames], spec.nbits)
    ret = [bits, rx, noise_power]
    if want_h:
        if spec.mobile:
            h_freq = jnp.stack([hr[:n_frames], hi[:n_frames]],
                               axis=-1).reshape(
                n_frames, spec.nsymbol, spec.nfft, 2)
        else:
            h = jnp.stack([hr[:n_frames], hi[:n_frames]], axis=-1)
            h_freq = jnp.broadcast_to(
                h[:, None], (n_frames, spec.nsymbol, spec.nfft, 2))
        ret.append(h_freq)
    if debug:
        ret.append((yr[:n_frames], yi[:n_frames],
                    nr[:n_frames], ni[:n_frames]))
    return tuple(ret)


# ---------------------------------------------------------------------------
# jnp emulator (CPU-testable: same math, jax.random bit source)
# ---------------------------------------------------------------------------


def emulate_fused_synthesize(spec: SynthSpec, n_frames: int, key: jax.Array,
                             snr_db: jnp.ndarray, debug: bool = False,
                             want_h: bool = False):
    """Pure-jnp rendition of the fused chain (same helper functions, random
    bits from jax.random) for validating the math off-TPU.  `debug=True`
    additionally returns the pre-noise signal and noise planes so tests can
    re-derive rx through the framework's own awgn/batch-norm ops."""
    kb, kt1, kt2, kn1, kn2, kj1, kj2 = jax.random.split(key, 7)
    l = spec.length
    std = (_SQRT_HALF * 10.0 ** (-snr_db.reshape(-1).astype(jnp.float32)
                                 / 20.0)).reshape(n_frames, 1)
    rb = jax.lax.bitcast_convert_type(
        jax.random.bits(kb, (n_frames, spec.frame_size), jnp.uint32),
        jnp.int32)
    idx = rb & jnp.int32(2 ** spec.nbits - 1)
    sym_r, sym_i = _symbols_from_idx(idx.astype(jnp.float32), spec)
    x_r, x_i = _tx_waveform(sym_r, sym_i,
                            jnp.asarray(spec.w_r), jnp.asarray(spec.w_i),
                            jnp.asarray(spec.bias_r),
                            jnp.asarray(spec.bias_i), spec)
    rows = np.arange(n_frames) % spec.n_classes
    coeff_rows = jnp.asarray(spec.coeff_cls[rows])
    h = None
    if spec.do_fir:
        u1 = _u01(jax.lax.bitcast_convert_type(
            jax.random.bits(kt1, (n_frames, spec.taps), jnp.uint32),
            jnp.int32))
        u2 = _u01(jax.lax.bitcast_convert_type(
            jax.random.bits(kt2, (n_frames, spec.taps), jnp.uint32),
            jnp.int32))
        g0, g1 = _box_muller(u1, u2)
        zr, zi = g0 * _SQRT_HALF, g1 * _SQRT_HALF
        gt_r, gt_i = _tap_gt(zr, zi, coeff_rows,
                             jnp.asarray(spec.alpha_cls[rows]),
                             jnp.asarray(spec.gbias_cls[rows]), spec)
        y_r, y_i = _fir_same(x_r, x_i, gt_r, gt_i, spec)
        if want_h:
            h_r, h_i = _tap_h(zr, zi, coeff_rows,
                              jnp.asarray(spec.hb_r[rows]),
                              jnp.asarray(spec.hb_i[rows]),
                              jnp.asarray(spec.hbias_cls[rows]), spec)
            h = jnp.stack([h_r, h_i], axis=-1)
        if spec.mobile:
            # same math as the kernel's Doppler branch, jax.random bits
            sstaps = spec.jakes_base_r.size
            thr = (2.0 * np.pi) * _u01(jax.lax.bitcast_convert_type(
                jax.random.bits(kj1, (n_frames, sstaps), jnp.uint32),
                jnp.int32))
            thi = (2.0 * np.pi) * _u01(jax.lax.bitcast_convert_type(
                jax.random.bits(kj2, (n_frames, sstaps), jnp.uint32),
                jnp.int32))
            cyc = spec.dop_cycle
            dop_np = cyc[np.arange(n_frames) % len(cyc)]
            dopm = jnp.asarray(dop_np.astype(np.float32))[:, None]
            fd_np = spec.fd_cls[rows] * dop_np
            fvr = jnp.asarray(fd_np)[:, None] * \
                jnp.asarray(spec.jakes_base_r.reshape(1, sstaps))
            fvi = jnp.asarray(fd_np)[:, None] * \
                jnp.asarray(spec.jakes_base_i.reshape(1, sstaps))
            alpha_rows = jnp.asarray(spec.alpha_cls[rows])
            gbias_rows = jnp.asarray(spec.gbias_cls[rows])
            gts_r, gts_i = [], []
            zsel = []
            for s in range(spec.nsymbol):
                zrs, zis = _jakes_sym_gains(thr, thi, fvr, fvi,
                                            s * spec.t_sym, spec.taps)
                zsr = dopm * zrs + (1.0 - dopm) * zr
                zsi = dopm * zis + (1.0 - dopm) * zi
                zsel.append((zsr, zsi))
                g_sr, g_si = _tap_gt(zsr, zsi, coeff_rows, alpha_rows,
                                     gbias_rows, spec)
                gts_r.append(g_sr)
                gts_i.append(g_si)
            masks = jnp.asarray(_sym_window_masks(spec))
            yd_r, yd_i = _fir_sym_unified(
                x_r, x_i, jnp.stack(gts_r, 1), jnp.stack(gts_i, 1),
                masks, spec)
            y_r = dopm * yd_r + (1.0 - dopm) * y_r
            y_i = dopm * yd_i + (1.0 - dopm) * y_i
            if want_h:
                hs = []
                hb_r_rows = jnp.asarray(spec.hb_r[rows])
                hb_i_rows = jnp.asarray(spec.hb_i[rows])
                hbias_rows = jnp.asarray(spec.hbias_cls[rows])
                for s in range(spec.nsymbol):
                    zsr, zsi = zsel[s]
                    hsr, hsi = _tap_h(zsr, zsi, coeff_rows, hb_r_rows,
                                      hb_i_rows, hbias_rows, spec)
                    hs.append(jnp.stack([hsr, hsi], axis=-1))
                h = jnp.stack(hs, axis=1)        # [B, S, nfft, 2]
    else:
        y_r, y_i = x_r, x_i
        if want_h:
            h = jnp.stack([jnp.ones((n_frames, spec.nfft)),
                           jnp.zeros((n_frames, spec.nfft))], axis=-1)
    nu1 = _u01(jax.lax.bitcast_convert_type(
        jax.random.bits(kn1, (n_frames, l), jnp.uint32), jnp.int32))
    nu2 = _u01(jax.lax.bitcast_convert_type(
        jax.random.bits(kn2, (n_frames, l), jnp.uint32), jnp.int32))
    un_r, un_i = _box_muller(nu1, nu2)
    n_r, n_i = std * un_r, std * un_i

    def rowsum(v):
        return jnp.sum(v, axis=0)

    sums = jnp.stack([
        rowsum(y_r), rowsum(y_i), rowsum(y_r * y_r), rowsum(y_i * y_i),
        rowsum(n_r), rowsum(n_i), rowsum(n_r * n_r), rowsum(n_i * n_i),
        rowsum(y_r * n_r), rowsum(y_i * n_i)])
    a, c, noise_power, _ = _combine_stats(sums, n_frames)
    rxr = y_r * c[0] + n_r * c[1] - c[2]
    rxi = y_i * c[3] + n_i * c[4] - c[5]
    rx = jnp.stack([rxr, rxi], axis=-1).reshape(
        n_frames, spec.nsymbol, spec.sps, 2)
    bits = _bits_from_idx(idx, spec.nbits)
    ret = [bits, rx, noise_power]
    if want_h:
        if h.ndim == 4:     # mobile: already per-symbol [B, S, nfft, 2]
            ret.append(h)
        else:
            ret.append(jnp.broadcast_to(
                h[:, None], (n_frames, spec.nsymbol, spec.nfft, 2)))
    if debug:
        ret.append((y_r, y_i, n_r, n_i))
    return tuple(ret)
