"""BER-vs-SNR sweep protocols and CSV result schema.

Parity with the reference evaluation protocols:
  * single-channel sweep: SNR -10:1:30, 20,000 frames/point, CSV columns
    SNR,BER,Loss (`dev/py/ofdmreceiver_np.py:59-91`);
  * cross-channel sweep: test channels {ETU,EVA,EPA,Flat,Custom},
    SNR -10:5:30, 30,000 frames/point, per-channel CSVs named
    `Test_DCCN_<token>_Equalizer<opt>_<trainchan>_test_chan_<testchan>
    [_mobile].csv` (`dev/py/ofdmreceiver_np_mp.py:62-104`).

TPU-native design: each SNR point accumulates a confusion matrix over batched
jitted eval steps (frames are generated on device); across a mesh the
confusion matrix is a `psum` — BER aggregation is exact regardless of batch
slicing.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

CROSS_TEST_CHANNELS = ("ETU", "EVA", "EPA", "Flat", "Custom")


@dataclasses.dataclass
class SweepResult:
    snr: np.ndarray
    ber: np.ndarray
    loss: np.ndarray

    def to_csv(self, path: str) -> str:
        """Reference CSV schema: header SNR,BER,Loss; SNR as index column."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write("SNR,BER,Loss\n")
            for s, b, l in zip(self.snr, self.ber, self.loss):
                f.write(f"{s},{b},{l}\n")
        return path


def ber_sweep(trainer, params, key: jax.Array,
              snrs: Iterable[int] = range(-10, 31),
              frames_per_point: int = 20000,
              batch_frames: int = 2000,
              log_fn=print, mesh=None,
              point_batch: bool = False) -> SweepResult:
    """Run the BER sweep with on-device data generation.

    All SNR points are interleaved into shared batches (the channel already
    supports a per-frame SNR vector), so the whole sweep is
    `frames_per_point * n_snrs / batch` invocations of ONE compiled program
    — per-point error counts come back as a segment sum over the SNR index.

    `point_batch=True` selects the REFERENCE-PARITY protocol instead: one
    SNR point per batch, input power-normalization statistics over the
    whole `batch_frames` batch.  The reference evaluates each point with a
    single session.run over all 30,000 frames (`ofdmreceiver_np_mp.py:89`),
    i.e. its batch-norm statistics are effectively noise-free; the
    interleaved mode's per-SNR groups (batch_frames / n_snrs frames) carry
    variance-estimate noise that acts as a multiplicative amplitude jitter
    of ~sqrt(1/(2*group)) and imposes an artificial high-SNR BER ceiling
    (~29.6 dB at 444-frame groups — measured 2.4x BER inflation at 30 dB on
    EPA QPSK).  Use point_batch with batch_frames=30000 for claim-grade
    high-SNR cells; the interleaved mode remains the fast path for broad
    curves and mesh sweeps.

    With `mesh` (a ('dp', ...) `jax.sharding.Mesh`), each batch is
    shard_mapped over 'dp': every device generates and evaluates its own
    slice of the (SNR-point x repeat) grid with an axis-folded PRNG key, and
    the per-point error/CE counts are `psum`'d — the pod-scale replacement
    for the reference's per-process sweep jobs (SURVEY.md P2/P4).  Power
    normalization groups are then per-device; statistically equivalent for
    the batch sizes used.
    """
    snrs = list(snrs)
    n_pts = len(snrs)
    if point_batch:
        return _ber_sweep_point_batch(trainer, params, key, snrs,
                                      frames_per_point, batch_frames, log_fn,
                                      mesh=mesh)
    n_dev = 1 if mesh is None else mesh.shape["dp"]
    rep = max(1, batch_frames // n_pts)
    # each device must hold enough frames per SNR point for meaningful
    # power-normalization group statistics (1 frame/group would zero the
    # input: var over a single frame is 0); floor at 4 frames/point/device
    rep = max(rep, 4 * n_dev)
    rep += (-rep) % n_dev          # divisible by dp width
    snr_np = np.repeat(np.asarray(snrs, np.float32), rep)
    idx_np = np.repeat(np.arange(n_pts), rep)
    # interleave so every device's contiguous shard covers all SNR points
    order = np.argsort(np.tile(np.arange(rep), n_pts), kind="stable")
    snr_vec = jnp.asarray(snr_np[order])
    point_idx = jnp.asarray(idx_np[order])
    frames_per_call = snr_vec.shape[0]
    onehot = jnp.asarray(
        np.eye(n_pts, dtype=np.float32)[np.asarray(point_idx)])

    def eval_batch(params, key, snr_vec, point_idx, onehot):
        bits, rx_in, _, _, _ = trainer.synthesize(
            key, snr_vec.shape[0], snr_vec, norm_groups=onehot)
        logits, *_ = trainer.model.apply({"params": params}, rx_in)
        from dl_ofdm_tpu.train import metrics as M
        pred = M.bit_predictions(logits)
        err_per_frame = jnp.sum((pred != bits).astype(jnp.int32),
                                axis=(1, 2))
        # per-point reductions via the (already materialized) one-hot mask —
        # segment_sum lowers to a serialized scatter-add on TPU (same issue
        # as the bincount confusion matrix); a masked sum is one fused pass.
        # int32 accumulation keeps error counts exact at any sweep size.
        errors = jnp.sum(err_per_frame[:, None] * onehot.astype(jnp.int32),
                         axis=0)
        # per-point summed CE
        z = logits.reshape(logits.shape[0], -1, 2)
        logp = jax.nn.log_softmax(z, axis=-1)
        y1h = jax.nn.one_hot(bits.reshape(bits.shape[0], -1), 2,
                             dtype=logp.dtype)
        ce_frame = -jnp.mean(jnp.sum(y1h * logp, axis=-1), axis=1)
        ce = ce_frame @ onehot
        return errors, ce

    if mesh is None:
        @jax.jit
        def sweep_batch(params, key):
            return eval_batch(params, key, snr_vec, point_idx, onehot)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def shard_fn(params, key, snr_s, idx_s, oh_s):
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            errors, ce = eval_batch(params, key, snr_s, idx_s, oh_s)
            return (jax.lax.psum(errors, "dp"), jax.lax.psum(ce, "dp"))

        sharded = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("dp"), P("dp"), P("dp", None)),
            out_specs=(P(), P()),
            check_vma=False)

        @jax.jit
        def sweep_batch(params, key):
            return sharded(params, key, snr_vec, point_idx, onehot)

    frames_per_pt_call = frames_per_call // n_pts
    n_calls = max(1, frames_per_point // frames_per_pt_call)
    tot_err = np.zeros(n_pts, np.int64)
    tot_ce = np.zeros(n_pts, np.float64)
    for _ in range(n_calls):
        key, k = jax.random.split(key)
        errors, ce = sweep_batch(params, k)
        tot_err += np.asarray(errors, np.int64)
        tot_ce += np.asarray(ce, np.float64)
    bits_per_frame = trainer.plan.frame_size * trainer.cfg.nbits
    total_bits = n_calls * frames_per_pt_call * bits_per_frame
    bers = tot_err / total_bits
    losses = tot_ce / (n_calls * frames_per_pt_call)
    for snr, ber, loss in zip(snrs, bers, losses):
        log_fn(f"SNR: {snr:.2f}, BER: {ber:.8f}, Loss: {loss:f}")
    return SweepResult(np.asarray(snrs, dtype=float), np.asarray(bers),
                       np.asarray(losses))


def _ber_sweep_point_batch(trainer, params, key, snrs, frames_per_point,
                           batch_frames, log_fn, mesh=None):
    """Reference-parity sweep: one SNR per batch, power-normalization
    statistics over the whole batch (see `ber_sweep(point_batch=True)`).

    With `mesh` (a ('dp', ...) Mesh) the protocol composes with data
    parallelism EXACTLY: each device synthesizes `batch_frames/dp` frames
    from a per-device fold of the point key, the normalization moments
    (sum, sum-of-squares over the batch axis) are `psum`'d over 'dp' before
    normalizing — so every device normalizes with the statistics of the FULL
    `batch_frames` batch, matching the single-device protocol (the
    reference's one-session.run-per-point normalization,
    `ofdmreceiver_np_mp.py:89`) up to float reduction order — and the
    error/CE counts are `psum`'d.  Verified bit-tight against an explicit
    single-process control in `tests/test_parallel.py`."""
    from dl_ofdm_tpu.train import metrics as M

    batch_frames = min(batch_frames, frames_per_point)

    def eval_counts(params, bits, rx_in):
        logits, *_ = trainer.model.apply({"params": params}, rx_in)
        pred = M.bit_predictions(logits)
        errors = jnp.sum((pred != bits).astype(jnp.int32))
        z = logits.reshape(logits.shape[0], -1, 2)
        logp = jax.nn.log_softmax(z, axis=-1)
        y1h = jax.nn.one_hot(bits.reshape(bits.shape[0], -1), 2,
                             dtype=logp.dtype)
        ce = -jnp.sum(jnp.mean(jnp.sum(y1h * logp, axis=-1), axis=1))
        return errors, ce

    if mesh is None:
        @jax.jit
        def point_eval(params, key, snr_scalar):
            snr_vec = jnp.full((batch_frames,), snr_scalar, jnp.float32)
            bits, rx_in, _, _, _ = trainer.synthesize(
                key, batch_frames, snr_vec)
            return eval_counts(params, bits, rx_in)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape["dp"]
        shard_frames = -(-batch_frames // n_dev)      # ceil division
        batch_frames = shard_frames * n_dev

        def shard_fn(params, key, snr_scalar):
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            snr_vec = jnp.full((shard_frames,), snr_scalar, jnp.float32)
            bits, y_iq, _, _, _ = trainer.synthesize(
                key, shard_frames, snr_vec, normalize=False)
            # global whole-batch moments: psum the per-shard partial sums
            s = jax.lax.psum(jnp.sum(y_iq, axis=0, keepdims=True), "dp")
            sq = jax.lax.psum(
                jnp.sum(y_iq * y_iq, axis=0, keepdims=True), "dp")
            mean = s / batch_frames
            var = sq / batch_frames - mean * mean
            rx_in = ((y_iq - mean) * jax.lax.rsqrt(var + 1e-9)
                     / jnp.sqrt(2.0))
            errors, ce = eval_counts(params, bits, rx_in)
            return jax.lax.psum(errors, "dp"), jax.lax.psum(ce, "dp")

        sharded = shard_map(shard_fn, mesh=mesh,
                            in_specs=(P(), P(), P()),
                            out_specs=(P(), P()),
                            check_vma=False)

        @jax.jit
        def point_eval(params, key, snr_scalar):
            return sharded(params, key, snr_scalar)

    n_calls = max(1, frames_per_point // batch_frames)
    bits_per_frame = trainer.plan.frame_size * trainer.cfg.nbits
    bers, losses = [], []
    for snr in snrs:
        tot_err, tot_ce = 0, 0.0
        for _ in range(n_calls):
            key, k = jax.random.split(key)
            errors, ce = point_eval(params, k, jnp.float32(snr))
            tot_err += int(errors)
            tot_ce += float(ce)
        frames = n_calls * batch_frames
        bers.append(tot_err / (frames * bits_per_frame))
        losses.append(tot_ce / frames)
        log_fn(f"SNR: {snr:.2f}, BER: {bers[-1]:.8f}, Loss: {losses[-1]:f}")
    return SweepResult(np.asarray(snrs, dtype=float), np.asarray(bers),
                       np.asarray(losses))


def cross_channel_sweep(make_trainer, params, key: jax.Array,
                        token: str, opt: int, train_channel: str,
                        mobile: bool = False, save_dir: str = ".",
                        snrs: Sequence[int] = tuple(range(-10, 31, 5)),
                        frames_per_point: int = 30000,
                        batch_frames: int = 3000,
                        test_channels: Sequence[str] = CROSS_TEST_CHANNELS,
                        log_fn=print,
                        point_batch: bool = False,
                        mesh=None) -> dict[str, SweepResult]:
    """Evaluate one trained model across the 5 test channels.

    `make_trainer(channel, mobile)` must return a Trainer-like object whose
    model matches `params`.  `point_batch=True` selects the reference-parity
    per-point normalization protocol (see `ber_sweep`); `mesh` shard_maps
    each batch over its 'dp' axis (both protocols compose with it).
    """
    results = {}
    for chan in test_channels:
        trainer = make_trainer(chan, mobile)
        log_fn(f"Test in {chan}, mobile: {mobile}")
        key, k = jax.random.split(key)
        res = ber_sweep(trainer, params, k, snrs, frames_per_point,
                        batch_frames, log_fn, point_batch=point_batch,
                        mesh=mesh)
        suffix = "_mobile" if mobile else ""
        name = (f"Test_DCCN_{token}_Equalizer{opt}_{train_channel}"
                f"_test_chan_{chan}{suffix}.csv")
        res.to_csv(os.path.join(save_dir, name))
        results[chan] = res
    return results
