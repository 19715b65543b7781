"""Experiment sweep orchestrator — `dev/py/run_local_ofdm.py` + `locals.py`
equivalent (P2/P4 in SURVEY.md).

Grid parity (`run_local_ofdm.py:30-119`):
  phase A (awgn): for longcp in {False, True}: nbits in 4..1, cp in {F, T},
    SNR = 5*nbits dB, 1200*nbits epochs -> basic DCCN training + sweep CSV;
  phase B: nbits=1, channel=mixRayleigh, opt=0, cp in {T, F}, 4000 epochs ->
    equalizer transfer learning + cross-channel sweep CSVs.

Idempotent resume preserved: a config is skipped when its result CSV already
exists (`run_local_ofdm.py:82-90,110-118`).  Instead of spawning one OS
process per config, configs run in-process sequentially (each is a handful of
jitted programs); the process boundary of the reference bought isolation for
TF1 graph state, which JAX does not need.
"""
from __future__ import annotations

import os
import time


def run_sweep(awgn: bool = True, save_dir: str = "./ofdm_lte_ext_64",
              quick: bool = False, log_fn=print):
    """Run the full experiment grid.  `quick` shrinks epochs/frames for CI."""
    import jax

    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.eval.sweep import ber_sweep, cross_channel_sweep
    from dl_ofdm_tpu.train import checkpoint as ckpt
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
    from dl_ofdm_tpu.train.loop import Trainer

    token = "OFDM_Dense3"
    batchsize = 512
    os.makedirs(save_dir, exist_ok=True)
    result_dir = os.path.join(save_dir, "results")
    os.makedirs(result_dir, exist_ok=True)
    ebno = 5.0

    for longcp in (False, True):
        # the reference reuses one token across longcp passes and relies on
        # moving results into per-longcp dirs (`run_local_ofdm.py:82-90`);
        # here the short-CP arm is suffixed so both arms coexist in one dir
        # (same convention as the classical `_shortcp` CSVs).
        cp_suffix = "" if longcp else "_shortcp"
        if awgn:
            for nbits in (4, 3, 2, 1):
                snr = ebno * nbits
                epochs = 2 if quick else 1200 * nbits
                for cp in (False, True):
                    token1 = (f"{token}_{nbits}mod_snr{int(snr)}_cp{cp}"
                              f"{cp_suffix}")
                    csv = os.path.join(result_dir,
                                       f"Test_DCCN_{token1}_AWGN.csv")
                    if os.path.isfile(csv):
                        log_fn(f"skip {csv} (exists)")
                        continue
                    cfg = OFDMConfig(nbits=nbits, cp=cp, longcp=longcp)
                    tc = TrainConfig(snr=snr, batch_size=batchsize,
                                     max_epoch_num=epochs, early_stop=200,
                                     token=token1, save_dir=save_dir)
                    t0 = time.time()
                    tr = Trainer(cfg, tc, channel="AWGN")
                    state, info = tr.fit(log_fn=log_fn)
                    ckpt.save(os.path.join(save_dir, token1), state)
                    frames = 200 if quick else 20000
                    res = ber_sweep(tr, state.params,
                                    jax.random.PRNGKey(99),
                                    frames_per_point=frames,
                                    batch_frames=min(2000, frames),
                                    log_fn=log_fn)
                    res.to_csv(csv)
                    log_fn(f"{token1}: {time.time()-t0:.1f}s -> {csv}")

        # phase B: equalizer stage on mixRayleigh
        nbits, opt = 1, 0
        snr = ebno * nbits
        epochs = 2 if quick else 4000
        for cp in (True, False):
            chan = "mixRayleigh"
            token1 = f"{token}_{nbits}mod_snr{int(snr)}_cp{cp}{cp_suffix}"
            done_csv = os.path.join(
                result_dir,
                f"Test_DCCN_{token1}_Equalizer{opt}_{chan}_test_chan_Custom.csv")
            if os.path.isfile(done_csv):
                log_fn(f"skip {done_csv} (exists)")
                continue
            cfg = OFDMConfig(nbits=nbits, cp=cp, longcp=longcp)
            tc = TrainConfig(snr=snr, batch_size=batchsize,
                             max_epoch_num=epochs, early_stop=200,
                             token=token1, save_dir=save_dir, opt=opt)
            base_path = os.path.join(save_dir, token1)
            base = Trainer(cfg, tc, channel="AWGN")
            base_state = base.init_state(jax.random.PRNGKey(0))
            try:
                base_state = ckpt.restore(base_path, base_state)
            except Exception:
                log_fn(f"no pretrained {base_path}; training AWGN stage first")
                base_state, _ = base.fit(log_fn=log_fn)
                ckpt.save(base_path, base_state)
            eq = EqualizerTrainer(cfg, tc, channel=chan,
                                  pretrained_rx=base_state.params)
            state, info = eq.fit(log_fn=log_fn)
            ckpt.save(os.path.join(save_dir,
                                   f"{token1}_Equalizer{opt}_{chan}"), state)

            def make_trainer(test_chan, mobile, _cfg=cfg, _tc=tc,
                             _rx=base_state.params):
                return EqualizerTrainer(_cfg, _tc, channel=test_chan,
                                        mobile=mobile, pretrained_rx=_rx)

            frames = 200 if quick else 30000
            cross_channel_sweep(
                make_trainer, state.params, jax.random.PRNGKey(777),
                token1, opt, chan, mobile=False, save_dir=result_dir,
                frames_per_point=frames, batch_frames=min(3000, frames),
                log_fn=log_fn)
