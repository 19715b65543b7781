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
              log_fn=print) -> SweepResult:
    """Run the BER sweep with on-device data generation.

    `trainer` provides the jitted `eval_step`; any Trainer-like object works
    (basic receiver or equalized receiver, any channel).
    """
    snrs = list(snrs)
    bers, losses = [], []
    n_batches = max(1, frames_per_point // batch_frames)
    for snr in snrs:
        conf = jnp.zeros((2, 2), jnp.int32)
        ce_sum = 0.0
        for i in range(n_batches):
            key, k = jax.random.split(key)
            aux = trainer.eval_step(
                params, k, batch_frames,
                jnp.full((batch_frames,), float(snr), jnp.float32))
            conf = conf + aux["conf"]
            ce_sum += float(aux["ce"])
        total = int(conf.sum())
        errors = int(conf[0, 1] + conf[1, 0])
        ber = errors / max(total, 1)
        loss = ce_sum / n_batches
        bers.append(ber)
        losses.append(loss)
        log_fn(f"SNR: {snr:.2f}, BER: {ber:.8f}, Loss: {loss:f}")
    return SweepResult(np.asarray(snrs, dtype=float), np.asarray(bers),
                       np.asarray(losses))


def cross_channel_sweep(make_trainer, params, key: jax.Array,
                        token: str, opt: int, train_channel: str,
                        mobile: bool = False, save_dir: str = ".",
                        snrs: Sequence[int] = tuple(range(-10, 31, 5)),
                        frames_per_point: int = 30000,
                        batch_frames: int = 3000,
                        test_channels: Sequence[str] = CROSS_TEST_CHANNELS,
                        log_fn=print) -> dict[str, SweepResult]:
    """Evaluate one trained model across the 5 test channels.

    `make_trainer(channel, mobile)` must return a Trainer-like object whose
    model matches `params`.
    """
    results = {}
    for chan in test_channels:
        trainer = make_trainer(chan, mobile)
        log_fn(f"Test in {chan}, mobile: {mobile}")
        key, k = jax.random.split(key)
        res = ber_sweep(trainer, params, k, snrs, frames_per_point,
                        batch_frames, log_fn)
        suffix = "_mobile" if mobile else ""
        name = (f"Test_DCCN_{token}_Equalizer{opt}_{train_channel}"
                f"_test_chan_{chan}{suffix}.csv")
        res.to_csv(os.path.join(save_dir, name))
        results[chan] = res
    return results
