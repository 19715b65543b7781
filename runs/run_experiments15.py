"""Phase-15 queue (round 4): the round-3 VERDICT's chip work.

Steps (each resumable by done-marker/CSV; run via runs/p15_driver.sh):
  rootcause_stats    fused-Doppler distribution-identity probes
                     (scripts/doppler_rootcause.py stats) — VERDICT #1.
  rootcause_control  3-arm x 2-seed matched training control — VERDICT #1.
  qpsk_tail          EPA QPSK @30 claim cell: extended-tail SNR curriculum
                     continuation (+ fresh-tail fallback), gated re-sweep
                     with EPA at 120k frames/point — VERDICT #2.
  bpsk_mobile_tail   EPA BPSK-mobile @30 claim cell: same recipe on the
                     mobile arm — VERDICT #2.
  dnn                retrain the REBUILT all-dense ablation (DNNReceiver
                     symbol-flatten fix, models/dccn.py) with a training
                     loss trace — VERDICT #7.
  bf16_control       f32-vs-bf16 matched training controls + interleaved
                     step timing — VERDICT #4.

Claim protocol: `/root/reference/README.md:25` claim,
`/root/reference/dev/py/ofdmreceiver_np_mp.py:62-104` sweep protocol.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments8 import RUNS, base_token, ensure_awgn_base, log
from dl_ofdm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import dataclasses

from run_experiments14 import BASE_EPOCHS, OPT, _quick_probe, _shipped_ber
from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.eval.sweep import ber_sweep, cross_channel_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
from dl_ofdm_tpu.train.loop import Trainer, TrainState


# -- extended-tail curriculum continuations (VERDICT #2) ---------------------

def _tail_continue(nbits: int, mobile: bool, epochs: int, lr: float,
                   seed: int, fresh: bool = False):
    """Fit one tail-curriculum arm.  `fresh=False` continues the canonical
    checkpoint with a fresh low-LR Adam; `fresh=True` restarts from the
    pretrained AWGN base at the reference LR schedule (600 epochs
    recommended) — both with `curriculum_tail=True` so the 30 dB test point
    sits INSIDE the training distribution (train/curriculum.py SNR_TAIL_*)."""
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=epochs,
                     early_stop=epochs, token=token, save_dir=RUNS, opt=OPT,
                     seed=seed, curriculum_tail=True,
                     init_learning=(1e-3 if fresh else lr),
                     lr_decay_steps=(500 if fresh else 2000))
    eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=mobile,
                          pretrained_rx=base_params, freeze_rx=False)
    name = (f"{token}_Equalizer{OPT}_mixRayleigh"
            f"{'_mobile' if mobile else ''}")
    key = jax.random.PRNGKey(seed)
    st0 = eq.init_state(key)
    if fresh:
        st = st0
    else:
        prev = ckpt.restore(os.path.join(RUNS, name), st0)
        st = TrainState(prev.params, eq.optimizer.init(prev.params),
                        jnp.zeros((), jnp.int32))
    t0 = time.time()
    state, info = eq.fit(init_state=st, log_fn=lambda *a: None)
    return (cfg, tc, token, base_params, name, state,
            {"best_loss": round(info["best_loss"], 6),
             "best_epoch": info["best_epoch"],
             "secs": round(time.time() - t0, 1)})


def _probe_mobile(cfg, tc, base_params, params,
                  chans=("EPA", "ETU", "EVA"), frames=30000):
    out = {}
    for chan in chans:
        pe = EqualizerTrainer(cfg, tc, channel=chan, mobile=True,
                              pretrained_rx=base_params)
        res = ber_sweep(pe, params, jax.random.PRNGKey(4242), snrs=(20, 30),
                        frames_per_point=frames, batch_frames=3000,
                        log_fn=lambda *a: None)
        out[chan] = {20: float(res.ber[0]), 30: float(res.ber[1])}
    return out


def _shipped_mobile(token, chan, snrs=(20, 30)):
    path = os.path.join(
        RUNS, f"Test_DCCN_{token}_Equalizer{OPT}_mixRayleigh"
              f"_test_chan_{chan}_mobile.csv")
    rows = np.genfromtxt(path, delimiter=",", names=True)
    return {int(s): float(rows["BER"][list(rows["SNR"]).index(s)])
            for s in snrs}


def _resweep(cfg, tc, base_params, params, token, mobile: bool,
             big_chan: str = "EPA", big_frames: int = 120000):
    """Canonical cross-channel re-sweep; the claim-cell channel gets the
    4x-protocol frame count (variance rigor precedent: the round-3
    EPA-mobile sweep — its 30 dB cell shows ~2x key-to-key variance at
    30k frames/point)."""
    def make_trainer(test_chan, mob):
        return EqualizerTrainer(cfg, tc, channel=test_chan, mobile=mob,
                                pretrained_rx=base_params)

    others = [c for c in ("ETU", "EVA", "Flat", "Custom") if c != big_chan]
    cross_channel_sweep(make_trainer, params, jax.random.PRNGKey(777),
                        token, OPT, "mixRayleigh", mobile=mobile,
                        save_dir=RUNS, frames_per_point=30000,
                        batch_frames=3000, test_channels=others,
                        log_fn=lambda *a: None)
    cross_channel_sweep(make_trainer, params, jax.random.PRNGKey(778),
                        token, OPT, "mixRayleigh", mobile=mobile,
                        save_dir=RUNS, frames_per_point=big_frames,
                        batch_frames=4000, test_channels=(big_chan,),
                        log_fn=lambda *a: None)


def qpsk_tail(epochs: int = 300, lr: float = 2e-4):
    """EPA QPSK @30 (static): canonical CSV 3.47e-3 vs ALMMSE 1.95e-3.
    The QPSK curriculum (offset +2.5) topped out at 29.5 dB; the tail grid
    reaches 35.5.  Gate: EPA@30 must improve AND beat-or-match the other
    gate channels (no trading existing wins)."""
    marker = os.path.join(RUNS, "p15_qpsk_tail.json")
    if os.path.isfile(marker):
        log("skip qpsk_tail (marker exists)")
        return
    report = {"arms": {}}
    token = base_token(2, 10.0, True)
    shipped = {c: _shipped_ber(token, OPT, c) for c in ("EPA", "EVA", "ETU")}
    report["shipped"] = shipped
    log(f"qpsk_tail shipped: {shipped}")
    accepted = None
    for arm, fresh, n_ep in (("cont", False, epochs),
                             ("fresh", True, 600)):
        cfg, tc, token, base_params, name, state, info = _tail_continue(
            2, mobile=False, epochs=n_ep, lr=lr, seed=51, fresh=fresh)
        probe = _quick_probe(cfg, tc, base_params, state.params)
        info["probe"] = probe
        report["arms"][arm] = info
        ok = (probe["EPA"][30] < shipped["EPA"][30]
              and probe["EVA"][30] <= shipped["EVA"][30] * 1.15
              and probe["ETU"][30] <= shipped["ETU"][30] * 1.15
              and probe["EPA"][20] <= shipped["EPA"][20] * 1.15)
        log(f"qpsk_tail {arm}: probe={probe} -> "
            f"{'ACCEPT' if ok else 'reject'} ({info['secs']}s)")
        if ok:
            accepted = (cfg, tc, token, base_params, name, state, arm)
            break
    report["winner"] = accepted[-1] if accepted else None
    if accepted:
        cfg, tc, token, base_params, name, state, arm = accepted
        ckpt.save(os.path.join(RUNS, name), state)
        _resweep(cfg, tc, base_params, state.params, token, mobile=False)
        log("qpsk_tail: canonical CSVs re-swept (EPA at 120k frames/point)")
    with open(marker, "w") as fp:
        json.dump(report, fp, indent=1)


def bpsk_mobile_tail(epochs: int = 300, lr: float = 2e-4):
    """EPA BPSK-mobile @30: honest 120k-frame value 2.02e-3 vs LS-Spline
    7.87e-4.  BPSK curriculum (offset 0) capped at 27 dB; tail reaches 33."""
    marker = os.path.join(RUNS, "p15_bpsk_mobile_tail.json")
    if os.path.isfile(marker):
        log("skip bpsk_mobile_tail (marker exists)")
        return
    report = {"arms": {}}
    token = base_token(1, 5.0, True)
    shipped = {c: _shipped_mobile(token, c) for c in ("EPA", "ETU", "EVA")}
    report["shipped"] = shipped
    log(f"bpsk_mobile_tail shipped: {shipped}")
    accepted = None
    for arm, fresh, n_ep in (("cont", False, epochs),
                             ("fresh", True, 600)):
        cfg, tc, token, base_params, name, state, info = _tail_continue(
            1, mobile=True, epochs=n_ep, lr=lr, seed=61, fresh=fresh)
        probe = _probe_mobile(cfg, tc, base_params, state.params)
        info["probe"] = probe
        report["arms"][arm] = info
        ok = (probe["EPA"][30] < shipped["EPA"][30]
              and probe["ETU"][30] <= shipped["ETU"][30] * 1.15
              and probe["EVA"][30] <= shipped["EVA"][30] * 1.15
              and probe["EPA"][20] <= shipped["EPA"][20] * 1.15)
        log(f"bpsk_mobile_tail {arm}: probe={probe} -> "
            f"{'ACCEPT' if ok else 'reject'} ({info['secs']}s)")
        if ok:
            accepted = (cfg, tc, token, base_params, name, state, arm)
            break
    report["winner"] = accepted[-1] if accepted else None
    if accepted:
        cfg, tc, token, base_params, name, state, arm = accepted
        ckpt.save(os.path.join(RUNS, name), state)
        _resweep(cfg, tc, base_params, state.params, token, mobile=True)
        log("bpsk_mobile_tail: canonical CSVs re-swept (EPA at 120k)")
    with open(marker, "w") as fp:
        json.dump(report, fp, indent=1)


# -- DNN ablation retrain (VERDICT #7) ---------------------------------------

def dnn_retrain(nbits: int = 1, snr: float = 5.0, epochs: int = 300):
    """Retrain the REBUILT all-dense ablation (PARITY deviation #4: the
    old symbol-mean head made each symbol predict the whole frame — the
    0.234 flat floor was that bug).  Saves the training loss trace so the
    ablation row is evidence (runs/p15_dnn_trace.json)."""
    from dl_ofdm_tpu.models.dccn import DNNReceiver
    from dl_ofdm_tpu.ofdm.plan import build_plan
    marker = os.path.join(RUNS, "p15_dnn_trace.json")
    if os.path.isfile(marker):
        log("skip dnn retrain (marker exists)")
        return
    token = f"OFDM_DNN_{nbits}mod_snr{int(snr)}_cpTrue"
    cfg = OFDMConfig(nbits=nbits)
    plan = build_plan(cfg)
    model = DNNReceiver(nbits=nbits, nfft=cfg.nfft, cp_len=plan.cp_len,
                        nfilter=cfg.nfilter, frame_size=plan.frame_size)
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=epochs,
                     early_stop=100, token=token, save_dir=RUNS)
    tr = Trainer(cfg, tc, channel="AWGN", model=model)
    t0 = time.time()
    state, info = tr.fit(log_fn=lambda *a: None)
    log(f"{token}: retrained best={info['best_epoch']} "
        f"in {time.time()-t0:.0f}s loss={info['best_loss']:.5f}")
    ckpt.save(os.path.join(RUNS, token), state)
    res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                    snrs=range(-10, 31), frames_per_point=20000,
                    batch_frames=2000, log_fn=lambda *a: None)
    res.to_csv(os.path.join(RUNS, f"Test_DCCN_{token}_AWGN.csv"))
    with open(marker, "w") as fp:
        json.dump({"token": token, "best_epoch": info["best_epoch"],
                   "best_loss": info["best_loss"],
                   "history": info["history"]}, fp, indent=1)
    log(f"{token}: sweep + loss trace written")


# -- bf16 train-step controls (VERDICT #4) -----------------------------------

def bf16_control(epochs: int = 300):
    """Matched f32-vs-bf16 training controls + interleaved step timing.

    (a) basic DCCN AWGN fit x 2 seeds per dtype, 200k-frame sweep at
        0/5/10 dB (the scripts/fused_synth_train_control.py pattern);
    (b) 80-epoch equalizer mixRayleigh control (tail val BER);
    (c) within-process interleaved train-step timing at 9362 frames."""
    from dl_ofdm_tpu.utils.timing import bench_steps, d2h_fence, \
        measure_fence_cost
    marker = os.path.join(RUNS, "p15_bf16_control.json")
    if os.path.isfile(marker):
        log("skip bf16 control (marker exists)")
        return
    report = {"basic": {}, "equalizer": {}, "timing": {}}

    def run_basic(tag, dtype, seed):
        cfg = OFDMConfig(nbits=1, compute_dtype=dtype)
        tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=epochs,
                         early_stop=100, token=f"bf16ctl_{tag}", seed=seed,
                         save_dir="/tmp/bf16ctl")
        tr = Trainer(cfg, tc, channel="AWGN")
        t0 = time.time()
        state, info = tr.fit(log_fn=lambda *a: None)
        res = ber_sweep(tr, state.params, jax.random.PRNGKey(999),
                        snrs=[0, 5, 10], frames_per_point=200000,
                        batch_frames=4000, log_fn=lambda *a: None)
        bers = {int(s): float(b) for s, b in zip(res.snr, res.ber)}
        out = {"best_loss": round(info["best_loss"], 6), "bers": bers,
               "secs": round(time.time() - t0, 1)}
        log(f"bf16 basic {tag}: BER@5={bers[5]:.6f} loss="
            f"{out['best_loss']} ({out['secs']}s)")
        return out

    for seed in (1, 2):
        report["basic"][f"f32_s{seed}"] = run_basic(f"f32_s{seed}", None,
                                                    seed)
        report["basic"][f"bf16_s{seed}"] = run_basic(f"bf16_s{seed}",
                                                     "bfloat16", seed)

    def run_eq(tag, dtype, seed):
        cfg, token, base_params = ensure_awgn_base(nbits=1, snr=5.0,
                                                   epochs=BASE_EPOCHS[1])
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
        tc = TrainConfig(snr=5.0, batch_size=512, max_epoch_num=80,
                         early_stop=80, token=token, seed=seed,
                         save_dir="/tmp/bf16ctl", opt=OPT)
        eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=False,
                              pretrained_rx=base_params, freeze_rx=False)
        t0 = time.time()
        state, info = eq.fit(log_fn=lambda *a: None)
        tail = [h["val_ber"] for h in info["history"][-10:]]
        out = {"best_loss": round(info["best_loss"], 6),
               "tail_mean_val_ber": sum(tail) / len(tail),
               "secs": round(time.time() - t0, 1)}
        log(f"bf16 eq {tag}: tail val BER {out['tail_mean_val_ber']:.5f} "
            f"({out['secs']}s)")
        return out

    report["equalizer"]["f32_s1"] = run_eq("f32", None, 1)
    report["equalizer"]["bf16_s1"] = run_eq("bf16", "bfloat16", 1)

    # (c) interleaved step timing, 9362 frames
    fence = measure_fence_cost()
    key = jax.random.PRNGKey(0)
    steps = {}
    for dtype in (None, "bfloat16"):
        cfg = OFDMConfig(nbits=1, compute_dtype=dtype)
        tr = Trainer(cfg, TrainConfig(batch_size=65534), channel="ETU")
        st = tr.init_state(key)
        snr = jnp.full((tr.batch_frames,), 5.0, jnp.float32)
        box = {"s": st}

        def step(i, tr=tr, box=box, snr=snr):
            box["s"], _ = tr.train_step(box["s"], jax.random.fold_in(key, i),
                                        snr)
            return box["s"].params
        d2h_fence(step(0))
        steps[dtype or "f32"] = step
    best = {k: float("inf") for k in steps}
    for _ in range(4):
        for k, fn in steps.items():
            best[k] = min(best[k], bench_steps(fn, iters=20, repeats=1,
                                               fence_cost=fence))
    report["timing"] = {k: round(v * 1e3, 3) for k, v in best.items()}
    log(f"bf16 timing ms/step @9362: {report['timing']}")
    with open(marker, "w") as fp:
        json.dump(report, fp, indent=1)


if __name__ == "__main__":
    step = sys.argv[1] if len(sys.argv) > 1 else ""
    if step == "qpsk_tail":
        qpsk_tail()
    elif step == "bpsk_mobile_tail":
        bpsk_mobile_tail()
    elif step == "dnn":
        dnn_retrain()
    elif step == "bf16_control":
        bf16_control()
    else:
        print(__doc__)
        sys.exit(2)
