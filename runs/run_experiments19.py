"""Phase-19 queue (round 5): back every claim-table cell with a COMMITTED
arm.

After the round-4 recovery, three claim cells still depend on canonical
CSVs whose trained arms were lost to the checkpoint cleanup and exist
nowhere (runs/arms/MANIFEST.json documents this):

  * EVA QPSK mobile      — lost 2mod ZF mobile arm (p17 fresh rebuild
                           gate-FAILED; its tail arm loses EVA badly)
  * EPA/EVA 8QAM mobile  — lost 3mod frozen-opt0 mobile arm (the committed
                           ZF mobile arm loses these cells to the bar)

Steps (each: fresh fit -> reference-parity gate vs the committed canonical
CSVs -> on PASS: canonical checkpoint + npz export + parity resweep; on
FAIL: checkpoint saved aside `_r5s<seed>`, canonical CSVs untouched):

  zfrebuild <seed>    — 2mod mobile joint-ZF, STANDARD curriculum (the lost
                        arm's recipe; the p17 attempt used the tail grid)
  opt0rebuild <seed>  — 3mod mobile frozen-opt0 (run_experiments8 recipe)

Resumable by marker.  Chip must be free.
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments8 import RUNS, base_token, ensure_awgn_base, log
from dl_ofdm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np

from run_experiments14 import BASE_EPOCHS, OPT
from run_experiments16 import resweep
from dl_ofdm_tpu.config import TrainConfig
from dl_ofdm_tpu.eval.sweep import ber_sweep, cross_channel_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

GATE_CHANS = ("EPA", "EVA", "ETU")


def _committed_csv(token, chan, mobile, opt):
    path = os.path.join(
        RUNS, f"Test_DCCN_{token}_Equalizer{opt}_mixRayleigh_test_chan_"
              f"{chan}{'_mobile' if mobile else ''}.csv")
    rows = np.genfromtxt(path, delimiter=",", names=True)
    snrs = list(rows["SNR"])
    return {int(s): float(rows["BER"][snrs.index(s)]) for s in (20.0, 30.0)}


def _probe(cfg, tc, base_params, params, mobile, frames=30000):
    out = {}
    for chan in GATE_CHANS:
        eq = EqualizerTrainer(cfg, tc, channel=chan, mobile=mobile,
                              pretrained_rx=base_params)
        res = ber_sweep(eq, params, jax.random.PRNGKey(2727), snrs=(20, 30),
                        frames_per_point=frames, batch_frames=30000,
                        log_fn=lambda *a: None, point_batch=True)
        out[chan] = {20: float(res.ber[0]), 30: float(res.ber[1])}
    return out


def _gate(probe, shipped):
    no_regress = all(probe[c][s] <= shipped[c][s] * 1.15
                     for c in GATE_CHANS for s in (20, 30))
    better = (sum(probe[c][s] for c in GATE_CHANS for s in (20, 30))
              < sum(shipped[c][s] for c in GATE_CHANS for s in (20, 30)))
    return no_regress and better


def _already_passed(prefix):
    """True if a previous seed's marker for this config recorded a gate
    PASS — later seeds are retry attempts, not replacements."""
    import glob
    for p in glob.glob(os.path.join(RUNS, f"{prefix}_s*.json")):
        if json.load(open(p)).get("gate_pass"):
            return True
    return False


def _export_arm(name):
    """Refresh the committed npz + manifest for a (re)trained arm."""
    import subprocess
    subprocess.run([sys.executable, os.path.join(
        os.path.dirname(RUNS), "scripts", "export_arms.py"), "--force"],
        check=False, capture_output=True)
    log(f"arms export refreshed after {name}")


def zfrebuild(seed: int):
    """2mod mobile joint-ZF arm, standard curriculum (lost arm's recipe)."""
    nbits, mobile = 2, True
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p19_zfrebuild_{token}_s{seed}.json")
    if os.path.isfile(marker):
        log(f"skip zfrebuild s{seed} (marker exists)")
        return
    if _already_passed(f"p19_zfrebuild_{token}"):
        log(f"skip zfrebuild s{seed} (an earlier seed already passed)")
        return
    shipped = {c: _committed_csv(token, c, mobile, OPT) for c in GATE_CHANS}
    log(f"zfrebuild s{seed}: committed {shipped}")
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=600,
                     early_stop=250, token=token, save_dir=RUNS, opt=OPT,
                     seed=seed, init_learning=1e-3, lr_decay_steps=500)
    eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=True,
                          pretrained_rx=base_params, freeze_rx=False)
    t0 = time.time()
    state, info = eq.fit(log_fn=lambda *a: None)
    probe = _probe(cfg, tc, base_params, state.params, mobile)
    ok = _gate(probe, shipped)
    name = f"{token}_Equalizer{OPT}_mixRayleigh_mobile"
    save_to = name if ok else f"{name}_r5s{seed}"
    ckpt.save(os.path.join(RUNS, save_to), state)
    log(f"zfrebuild s{seed}: probe={probe} gate={'PASS' if ok else 'FAIL'}")
    if ok:
        resweep(nbits, mobile)
        _export_arm(name)
    with open(marker, "w") as fp:
        json.dump({"recipe": "fresh600_standard_curriculum_joint_zf",
                   "seed": seed, "committed_csv": shipped,
                   "parity_probe_30k": probe, "gate_pass": bool(ok),
                   "canonical_csvs_updated": bool(ok), "saved_as": save_to,
                   "secs": round(time.time() - t0, 1)}, fp, indent=1)


def opt0rebuild(seed: int):
    """3mod mobile frozen-opt0 arm (run_experiments8 recipe: frozen
    receiver, 600 epochs, default curriculum)."""
    nbits, mobile, opt = 3, True, 0
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p19_opt0rebuild_{token}_s{seed}.json")
    if os.path.isfile(marker):
        log(f"skip opt0rebuild s{seed} (marker exists)")
        return
    if _already_passed(f"p19_opt0rebuild_{token}"):
        log(f"skip opt0rebuild s{seed} (an earlier seed already passed)")
        return
    shipped = {c: _committed_csv(token, c, mobile, opt) for c in GATE_CHANS}
    log(f"opt0rebuild s{seed}: committed {shipped}")
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=600,
                     early_stop=150, token=token, save_dir=RUNS, opt=opt,
                     seed=seed)
    eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=True,
                          pretrained_rx=base_params)   # frozen rx
    t0 = time.time()
    state, info = eq.fit(log_fn=lambda *a: None)
    probe = _probe(cfg, tc, base_params, state.params, mobile)
    ok = _gate(probe, shipped)
    name = f"{token}_Equalizer{opt}_mixRayleigh_mobile"
    save_to = name if ok else f"{name}_r5s{seed}"
    ckpt.save(os.path.join(RUNS, save_to), state)
    log(f"opt0rebuild s{seed}: probe={probe} gate={'PASS' if ok else 'FAIL'}")
    if ok:
        # parity-protocol canonical resweep of the Equalizer0 family
        def make_trainer(test_chan, mob):
            return EqualizerTrainer(cfg, tc, channel=test_chan, mobile=mob,
                                    pretrained_rx=base_params)
        cross_channel_sweep(make_trainer, state.params,
                            jax.random.PRNGKey(888), token, opt,
                            "mixRayleigh", mobile=True, save_dir=RUNS,
                            frames_per_point=30000, batch_frames=30000,
                            log_fn=lambda *a: None, point_batch=True)
        _export_arm(name)
    with open(marker, "w") as fp:
        json.dump({"recipe": "fresh600_frozen_opt0_default_curriculum",
                   "seed": seed, "committed_csv": shipped,
                   "parity_probe_30k": probe, "gate_pass": bool(ok),
                   "canonical_csvs_updated": bool(ok), "saved_as": save_to,
                   "secs": round(time.time() - t0, 1)}, fp, indent=1)


def zfcontinue(seed: int):
    """2mod mobile arm via CONTINUATION from the committed 2mod STATIC ZF
    arm (the converse of round-4's successful mobile->static xrebuild):
    fresh mobile fits consistently land in an EVA-weak basin (tail rebuild
    p17 AND standard rebuild s101 both gate-FAILED on EVA), while the
    static arm's EVA cells are strong — a low-LR mobile fine-tune from it
    should keep them."""
    nbits, mobile = 2, True
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p19_zfcontinue_{token}_s{seed}.json")
    if os.path.isfile(marker):
        log(f"skip zfcontinue s{seed} (marker exists)")
        return
    if _already_passed(f"p19_zfrebuild_{token}") or \
            _already_passed(f"p19_zfcontinue_{token}"):
        log(f"skip zfcontinue s{seed} (an earlier attempt already passed)")
        return
    import jax.numpy as jnp

    from dl_ofdm_tpu.train.checkpoint import load_params_npz
    from dl_ofdm_tpu.train.loop import TrainState
    shipped = {c: _committed_csv(token, c, mobile, OPT) for c in GATE_CHANS}
    log(f"zfcontinue s{seed}: committed {shipped}")
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=300,
                     early_stop=300, token=token, save_dir=RUNS, opt=OPT,
                     seed=seed, init_learning=2e-4, lr_decay_steps=2000)
    # source: the committed static canonical arm (npz archive — works even
    # after a checkpoint-dir cleanup)
    static_params = load_params_npz(os.path.join(
        RUNS, "arms", f"{token}_Equalizer{OPT}_mixRayleigh.npz"))
    eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=True,
                          pretrained_rx=base_params, freeze_rx=False)
    params0 = jax.tree.map(jnp.asarray, static_params)
    st = TrainState(params0, eq.optimizer.init(params0),
                    jnp.zeros((), jnp.int32))
    t0 = time.time()
    state, info = eq.fit(init_state=st, log_fn=lambda *a: None)
    probe = _probe(cfg, tc, base_params, state.params, mobile)
    ok = _gate(probe, shipped)
    name = f"{token}_Equalizer{OPT}_mixRayleigh_mobile"
    save_to = name if ok else f"{name}_r5c{seed}"
    ckpt.save(os.path.join(RUNS, save_to), state)
    log(f"zfcontinue s{seed}: probe={probe} gate={'PASS' if ok else 'FAIL'}")
    if ok:
        resweep(nbits, mobile)
        _export_arm(name)
    with open(marker, "w") as fp:
        json.dump({"recipe": "static_to_mobile_continuation300",
                   "seed": seed, "committed_csv": shipped,
                   "parity_probe_30k": probe, "gate_pass": bool(ok),
                   "canonical_csvs_updated": bool(ok), "saved_as": save_to,
                   "secs": round(time.time() - t0, 1)}, fp, indent=1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "zfrebuild":
        zfrebuild(int(sys.argv[2]))
    elif len(sys.argv) >= 3 and sys.argv[1] == "opt0rebuild":
        opt0rebuild(int(sys.argv[2]))
    elif len(sys.argv) >= 3 and sys.argv[1] == "zfcontinue":
        zfcontinue(int(sys.argv[2]))
    else:
        print(__doc__)
        sys.exit(2)
