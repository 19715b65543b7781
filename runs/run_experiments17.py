"""Phase-17 queue (round 4): claim-cell arm recovery after checkpoint loss.

The round boundary between the round-4 builder sessions cleaned the
gitignored `runs/<token>/` checkpoint dirs (CLAUDE.md documents they are
cleanable); the canonical claim-table CSVs survive in git but the trained
equalizer arms behind them are gone.  This queue rebuilds ONLY the two
contested claim-cell arms (EPA QPSK @30 static, EPA BPSK-mobile @30) with
the `fresh` tail-curriculum recipe from run_experiments15 (AWGN base ->
600-epoch joint-ZF fit with `curriculum_tail=True`, reference LR schedule
1e-3 x0.98/500 — needs no lost checkpoint), gates the result under the
reference-parity normalization protocol (`ber_sweep(point_batch=True)`,
`ofdmreceiver_np_mp.py:89`), and re-sweeps the canonical CSVs via
run_experiments16.resweep only when the gate passes (no trading existing
wins).  The other six arms keep their committed interleaved-protocol CSVs —
conservative, since the parity protocol only removes an artificial ~29.6 dB
normalization ceiling (measured round 4: 2.91e-3 -> 1.2e-3 on the same
params at EPA QPSK @30).

Steps: `rebuild <nbits> <static|mobile>` — resumable by marker.
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_experiments8 import RUNS, base_token, log
from dl_ofdm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np

from run_experiments14 import OPT
from run_experiments15 import _tail_continue
from run_experiments16 import resweep
from dl_ofdm_tpu.eval.sweep import ber_sweep
from dl_ofdm_tpu.train import checkpoint as ckpt
from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer

SEEDS = {(2, False): 51, (1, True): 61,
         # phase-18 extension: the remaining claim-table ZF arms (fresh
         # checkpoints after the round-boundary cleanup + a shot at parity-
         # protocol improvements)
         (3, False): 71, (4, False): 72,
         (2, True): 73, (3, True): 74, (4, True): 75}
# arms whose EPA @30 cell was contested (gate additionally requires that
# single cell to improve; other arms gate on aggregate no-regression)
CONTESTED = {(2, False), (1, True)}
GATE_CHANS = ("EPA", "EVA", "ETU")


def _committed_csv(token: str, chan: str, mobile: bool):
    path = os.path.join(
        RUNS, f"Test_DCCN_{token}_Equalizer{OPT}_mixRayleigh_test_chan_"
              f"{chan}{'_mobile' if mobile else ''}.csv")
    rows = np.genfromtxt(path, delimiter=",", names=True)
    snrs = list(rows["SNR"])
    return {int(s): float(rows["BER"][snrs.index(s)]) for s in (20.0, 30.0)}


def _parity_probe(cfg, tc, base_params, params, mobile, chans=GATE_CHANS,
                  frames=30000):
    out = {}
    for chan in chans:
        eq = EqualizerTrainer(cfg, tc, channel=chan, mobile=mobile,
                              pretrained_rx=base_params)
        res = ber_sweep(eq, params, jax.random.PRNGKey(2727), snrs=(20, 30),
                        frames_per_point=frames, batch_frames=30000,
                        log_fn=lambda *a: None, point_batch=True)
        out[chan] = {20: float(res.ber[0]), 30: float(res.ber[1])}
    return out


def rebuild(nbits: int, mobile: bool):
    suffix = "_mobile" if mobile else ""
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p17_rebuild_{token}{suffix}.json")
    if os.path.isfile(marker):
        log(f"skip rebuild {token}{suffix} (marker exists)")
        return
    shipped = {c: _committed_csv(token, c, mobile) for c in GATE_CHANS}
    log(f"rebuild {token}{suffix}: committed CSVs {shipped}")
    seed = SEEDS[(nbits, mobile)]
    t0 = time.time()
    cfg, tc, token, base_params, name, state, info = _tail_continue(
        nbits, mobile=mobile, epochs=600, lr=2e-4, seed=seed, fresh=True)
    log(f"rebuild {token}{suffix}: fresh tail arm fit in {info['secs']}s "
        f"best_loss={info['best_loss']} best_epoch={info['best_epoch']}")
    probe = _parity_probe(cfg, tc, base_params, state.params, mobile)
    log(f"rebuild {token}{suffix}: parity probe {probe}")
    # gate: no gate cell may regress >15% (the parity protocol itself only
    # lowers BER, so a pass here is conservative); a CONTESTED arm must
    # additionally improve its EPA @30 cell, a non-contested arm must
    # improve the summed gate BER
    no_regress = all(probe[c][s] <= shipped[c][s] * 1.15
                     for c in GATE_CHANS for s in (20, 30))
    if (nbits, mobile) in CONTESTED:
        ok = no_regress and probe["EPA"][30] < shipped["EPA"][30]
    else:
        ok = no_regress and (
            sum(probe[c][s] for c in GATE_CHANS for s in (20, 30))
            < sum(shipped[c][s] for c in GATE_CHANS for s in (20, 30)))
    # a gate-PASS arm becomes the canonical checkpoint; a gate-FAIL arm is
    # saved ASIDE as `<name>_tail` so no ungated resweep/restore can ever
    # pick it up at the canonical name and overwrite the committed parity
    # CSVs (round-4 ADVICE #1) — tagsweep/claim_cell_ci look there
    name = f"{token}_Equalizer{OPT}_mixRayleigh{suffix}"
    save_to = name if ok else f"{name}_tail"
    ckpt.save(os.path.join(RUNS, save_to), state)
    if ok:
        # full parity-protocol canonical resweep (EPA at 120k frames for
        # the contested cells) BEFORE the marker write: a driver-timeout
        # kill mid-resweep must leave the rebuild retryable, not a marker
        # claiming success over partially-updated CSVs (round-4 ADVICE #2;
        # resweep's own marker makes the completed part resumable)
        resweep(nbits, mobile)
    else:
        log(f"rebuild {token}{suffix}: GATE FAIL — canonical CSVs kept; "
            f"checkpoint saved aside as {save_to}")
    report = {"recipe": "fresh600_tail_curriculum", "seed": seed,
              "fit": info, "committed_csv": shipped,
              "parity_probe_30k": probe, "gate_pass": bool(ok),
              "canonical_csvs_updated": bool(ok), "saved_as": save_to,
              "secs": round(time.time() - t0, 1)}
    with open(marker, "w") as fp:
        json.dump(report, fp, indent=1)


def tagsweep(nbits: int, mobile: bool):
    """Sweep the rebuilt tail-curriculum arm under its OWN train-mix tag
    (`mixRayleighTail`) — full parity-protocol cross-channel coverage, EPA
    at 120k frames — WITHOUT touching the canonical `mixRayleigh` CSVs.
    Used when the rebuild gate FAILS on a non-contested channel (e.g. the
    BPSK-mobile tail arm wins every EPA/EVA cell but trades ETU down 2x
    while still beating ETU's classical bar): the headline table's per-cell
    best-across-arms selection (make_results `arm_candidates`) then uses
    the tail arm only where it is genuinely best, labeled ' (ZF-tail)'."""
    suffix = "_mobile" if mobile else ""
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p17_tagsweep_{token}{suffix}.json")
    if os.path.isfile(marker):
        log(f"skip tagsweep {token}{suffix} (marker exists)")
        return
    from run_experiments14 import BASE_EPOCHS
    from run_experiments8 import ensure_awgn_base
    from run_experiments16 import BIG_EPA
    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.eval.sweep import cross_channel_sweep
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, token=token, save_dir=RUNS,
                     opt=OPT)
    name = f"{token}_Equalizer{OPT}_mixRayleigh{suffix}"
    # the tail arm lives ASIDE as `<name>_tail` since the ADVICE-r4 fix;
    # legacy layouts (rounds <=4) parked it at the canonical name
    src = name + "_tail" if os.path.isdir(
        os.path.join(RUNS, name + "_tail")) else name
    eq_r = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=mobile,
                            pretrained_rx=base_params, freeze_rx=False)
    state = ckpt.restore(os.path.join(RUNS, src),
                         eq_r.init_state(jax.random.PRNGKey(0)))

    def make_trainer(test_chan, mob):
        return EqualizerTrainer(cfg, tc, channel=test_chan, mobile=mob,
                                pretrained_rx=base_params)

    t0 = time.time()
    cross_channel_sweep(make_trainer, state.params, jax.random.PRNGKey(888),
                        token, OPT, "mixRayleighTail", mobile=mobile,
                        save_dir=RUNS, frames_per_point=30000,
                        batch_frames=30000,
                        test_channels=("ETU", "EVA", "Flat", "Custom"),
                        log_fn=lambda *a: None, point_batch=True)
    epa_frames = 120000 if (nbits, mobile) in BIG_EPA else 30000
    res = cross_channel_sweep(make_trainer, state.params,
                              jax.random.PRNGKey(889),
                              token, OPT, "mixRayleighTail", mobile=mobile,
                              save_dir=RUNS, frames_per_point=epa_frames,
                              batch_frames=30000, test_channels=("EPA",),
                              log_fn=lambda *a: None, point_batch=True)
    epa = res["EPA"]
    cells = {int(s): float(b) for s, b in zip(epa.snr, epa.ber)}
    log(f"tagsweep {token}{suffix}: parity protocol done in "
        f"{time.time()-t0:.0f}s; EPA @20={cells.get(20):.3e} "
        f"@30={cells.get(30):.3e} (EPA frames={epa_frames})")
    with open(marker, "w") as fp:
        json.dump({"arm": name, "tag": "mixRayleighTail",
                   "protocol": "point_batch_30k", "epa_frames": epa_frames,
                   "epa_ber": cells,
                   "secs": round(time.time() - t0, 1)}, fp, indent=1)


def _gate_cells(d):
    """(chan, snr) -> BER with JSON string keys normalized to int."""
    return {(c, int(s)): float(v)
            for c, m in d.items() for s, v in m.items()}


def _iter_failed_markers():
    import re as _re
    import glob as _glob
    for path in sorted(_glob.glob(
            os.path.join(RUNS, "p17_rebuild_*.json"))):
        with open(path) as fp:
            d = json.load(fp)
        # require an explicit recorded gate FAIL (a malformed/partial
        # marker must not trigger chip work)
        if d.get("gate_pass") is not False or d.get("canonical_csvs_updated"):
            continue
        m = _re.search(r"p17_rebuild_OFDM_Dense3_(\d)mod_.*?"
                       r"(_mobile)?\.json$", os.path.basename(path))
        if not m:
            continue
        probe = _gate_cells(d.get("parity_probe_30k", {}))
        committed = _gate_cells(d.get("committed_csv", {}))
        if not probe or set(probe) != set(committed):
            continue
        yield (int(m.group(1)), bool(m.group(2)), probe, committed)


def quarantine_failed():
    """A fresh rebuild that is catastrophically worse than the committed
    CSVs in EVERY gate cell (e.g. the 16QAM static fresh-from-base fit,
    BER~0.25 flat — that modulation needs the continuation/graft recipe)
    must not sit at the canonical checkpoint name where a later restore
    would silently pick up a garbage arm.  Move it aside to
    `<name>_p17fresh`."""
    for nbits, mobile, probe, committed in _iter_failed_markers():
        strictly_worse = all(probe[k] >= committed[k] for k in probe)
        badly_worse = (sum(probe.values())
                       > 1.5 * sum(committed.values()))
        if not (strictly_worse and badly_worse):
            continue
        token = base_token(nbits, 5.0 * nbits, True)
        name = (f"{token}_Equalizer{OPT}_mixRayleigh"
                f"{'_mobile' if mobile else ''}")
        src = os.path.join(RUNS, name)
        dst = os.path.join(RUNS, f"{name}_p17fresh")
        if os.path.isdir(src) and not os.path.isdir(dst):
            os.rename(src, dst)
            log(f"quarantine_failed: {name} -> {name}_p17fresh "
                f"(catastrophic fresh arm: strictly worse everywhere, summed >=1.5x committed)")


def tagsweep_failed():
    """Tag-sweep every rebuilt arm whose gate FAILED but which beats the
    committed CSVs in at least one gate cell (the mobile tail arms
    consistently improve the EPA cells while trading EVA/ETU): the arm
    enters the headline table's per-cell best-across-arms selection under
    the `mixRayleighTail` tag without overwriting the canonical arm.
    Catastrophic arms (quarantined by `quarantine_failed`) are skipped."""
    for nbits, mobile, probe, committed in _iter_failed_markers():
        if not any(probe[k] < committed[k] for k in probe):
            log(f"tagsweep_failed: skip nbits={nbits} mobile={mobile} "
                f"(no gate cell beats the committed CSVs)")
            continue
        token = base_token(nbits, 5.0 * nbits, True)
        name = (f"{token}_Equalizer{OPT}_mixRayleigh"
                f"{'_mobile' if mobile else ''}")
        if not os.path.isdir(os.path.join(RUNS, name)):
            log(f"tagsweep_failed: skip {name} (checkpoint quarantined "
                f"or missing)")
            continue
        log(f"tagsweep_failed: -> tagsweep({nbits}, mobile={mobile})")
        tagsweep(nbits, mobile)


def xrebuild(nbits: int):
    """Static-arm rebuild via CONTINUATION from the successfully rebuilt
    MOBILE arm of the same modulation (fresh-from-base joint fits do not
    converge for 8QAM/16QAM static — phase-14 finding; but the phase-18
    fresh mobile fits DID converge, and the static channel distribution
    differs only by Doppler).  Low-LR 300-epoch static fine-tune, parity
    gate as in rebuild(); on gate fail the arm is saved aside (never at the
    canonical name)."""
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p18_xrebuild_{token}.json")
    if os.path.isfile(marker):
        log(f"skip xrebuild {token} (marker exists)")
        return
    import dataclasses as _dc

    import jax.numpy as jnp

    from run_experiments14 import BASE_EPOCHS
    from run_experiments8 import ensure_awgn_base
    from dl_ofdm_tpu.config import TrainConfig
    from dl_ofdm_tpu.train.loop import TrainState
    shipped = {c: _committed_csv(token, c, False) for c in GATE_CHANS}
    log(f"xrebuild {token}: committed CSVs {shipped}")
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=300,
                     early_stop=300, token=token, save_dir=RUNS, opt=OPT,
                     seed=81 + nbits, curriculum_tail=True,
                     init_learning=2e-4, lr_decay_steps=2000)
    # source: the rebuilt mobile arm (phase-18 gate PASS)
    eq_m = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=True,
                            pretrained_rx=base_params, freeze_rx=False)
    prev = ckpt.restore(
        os.path.join(RUNS, f"{token}_Equalizer{OPT}_mixRayleigh_mobile"),
        eq_m.init_state(jax.random.PRNGKey(0)))
    eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=False,
                          pretrained_rx=base_params, freeze_rx=False)
    st = TrainState(prev.params, eq.optimizer.init(prev.params),
                    jnp.zeros((), jnp.int32))
    t0 = time.time()
    state, info = eq.fit(init_state=st, log_fn=lambda *a: None)
    log(f"xrebuild {token}: mobile->static continuation fit in "
        f"{time.time()-t0:.0f}s best_loss={info['best_loss']:.6f}")
    probe = _parity_probe(cfg, tc, base_params, state.params, False)
    log(f"xrebuild {token}: parity probe {probe}")
    no_regress = all(probe[c][s] <= shipped[c][s] * 1.15
                     for c in GATE_CHANS for s in (20, 30))
    ok = no_regress and (
        sum(probe[c][s] for c in GATE_CHANS for s in (20, 30))
        < sum(shipped[c][s] for c in GATE_CHANS for s in (20, 30)))
    name = f"{token}_Equalizer{OPT}_mixRayleigh"
    save_to = name if ok else f"{name}_p18x"
    ckpt.save(os.path.join(RUNS, save_to), state)
    if ok:
        # resweep BEFORE the marker write (ADVICE r4 #2: a kill mid-resweep
        # must leave this step retryable; resweep's own marker resumes it)
        resweep(nbits, False)
    else:
        log(f"xrebuild {token}: GATE FAIL — saved as {save_to}, canonical "
            f"CSVs kept")
    with open(marker, "w") as fp:
        json.dump({"recipe": "mobile_to_static_continuation300_tail",
                   "fit": {"best_loss": round(info["best_loss"], 6),
                           "best_epoch": info["best_epoch"]},
                   "committed_csv": shipped, "parity_probe_30k": probe,
                   "gate_pass": bool(ok), "canonical_csvs_updated": bool(ok),
                   "saved_as": save_to,
                   "secs": round(time.time() - t0, 1)}, fp, indent=1)


def graftrebuild(nbits: int = 3):
    """8QAM static arm via the proven phase-14 graft recipe: ONLY the
    Equalizer scope from the converged 16QAM static arm (now the xrebuild
    continuation arm) into the nbits-matched AWGN base, joint fine-tune at
    the fresh LR schedule (`run_experiments14.improve_static` graft16,
    which originally fixed the 8QAM anomaly).  Same parity gate; gate-fail
    saves aside as _p18g."""
    snr = 5.0 * nbits
    token = base_token(nbits, snr, True)
    marker = os.path.join(RUNS, f"p18_graftrebuild_{token}.json")
    if os.path.isfile(marker):
        log(f"skip graftrebuild {token} (marker exists)")
        return
    import jax.numpy as jnp

    from run_experiments14 import BASE_EPOCHS
    from run_experiments8 import ensure_awgn_base
    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    from dl_ofdm_tpu.train.loop import TrainState
    shipped = {c: _committed_csv(token, c, False) for c in GATE_CHANS}
    log(f"graftrebuild {token}: committed CSVs {shipped}")
    cfg, token, base_params = ensure_awgn_base(
        nbits=nbits, snr=snr, epochs=BASE_EPOCHS[nbits])
    tc = TrainConfig(snr=snr, batch_size=512, max_epoch_num=600,
                     early_stop=250, token=token, save_dir=RUNS, opt=OPT,
                     seed=91, curriculum_tail=True,
                     init_learning=1e-3, lr_decay_steps=500)
    # donor: the 16QAM static canonical arm (equalizer shapes are
    # nbits-independent: the equalizer acts on the [S, K] grid upstream of
    # demodulation — run_experiments14.py improve_static graft16)
    tok16 = base_token(4, 20.0, True)
    eq16 = EqualizerTrainer(
        OFDMConfig(nbits=4),
        TrainConfig(snr=20.0, batch_size=512, token=tok16, save_dir=RUNS,
                    opt=OPT),
        channel="mixRayleigh", pretrained_rx=None, freeze_rx=False)
    st16 = ckpt.restore(
        os.path.join(RUNS, f"{tok16}_Equalizer{OPT}_mixRayleigh"),
        eq16.init_state(jax.random.PRNGKey(0)))
    eq = EqualizerTrainer(cfg, tc, channel="mixRayleigh", mobile=False,
                          pretrained_rx=base_params, freeze_rx=False)
    st0 = eq.init_state(jax.random.PRNGKey(91))
    params0 = dict(st0.params)
    params0["Equalizer"] = st16.params["Equalizer"]
    st = TrainState(params0, eq.optimizer.init(params0),
                    jnp.zeros((), jnp.int32))
    t0 = time.time()
    state, info = eq.fit(init_state=st, log_fn=lambda *a: None)
    log(f"graftrebuild {token}: graft16 fit in {time.time()-t0:.0f}s "
        f"best_loss={info['best_loss']:.6f}")
    probe = _parity_probe(cfg, tc, base_params, state.params, False)
    log(f"graftrebuild {token}: parity probe {probe}")
    no_regress = all(probe[c][s] <= shipped[c][s] * 1.15
                     for c in GATE_CHANS for s in (20, 30))
    ok = no_regress and (
        sum(probe[c][s] for c in GATE_CHANS for s in (20, 30))
        < sum(shipped[c][s] for c in GATE_CHANS for s in (20, 30)))
    name = f"{token}_Equalizer{OPT}_mixRayleigh"
    save_to = name if ok else f"{name}_p18g"
    ckpt.save(os.path.join(RUNS, save_to), state)
    if ok:
        # resweep BEFORE the marker write (ADVICE r4 #2; see xrebuild)
        resweep(nbits, False)
    else:
        log(f"graftrebuild {token}: GATE FAIL — saved as {save_to}, "
            f"canonical CSVs kept")
    with open(marker, "w") as fp:
        json.dump({"recipe": "graft16_from_xrebuild_static",
                   "fit": {"best_loss": round(info["best_loss"], 6),
                           "best_epoch": info["best_epoch"]},
                   "committed_csv": shipped, "parity_probe_30k": probe,
                   "gate_pass": bool(ok), "canonical_csvs_updated": bool(ok),
                   "saved_as": save_to,
                   "secs": round(time.time() - t0, 1)}, fp, indent=1)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "rebuild":
        rebuild(int(sys.argv[2]), sys.argv[3] == "mobile")
    elif len(sys.argv) >= 4 and sys.argv[1] == "tagsweep":
        tagsweep(int(sys.argv[2]), sys.argv[3] == "mobile")
    elif len(sys.argv) >= 2 and sys.argv[1] == "tagsweep_failed":
        quarantine_failed()
        tagsweep_failed()
    elif len(sys.argv) >= 3 and sys.argv[1] == "xrebuild":
        xrebuild(int(sys.argv[2]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "graftrebuild":
        graftrebuild(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    else:
        print(__doc__)
        sys.exit(2)
