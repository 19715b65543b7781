"""Export every surviving trained arm to committed `runs/arms/*.npz`.

Round-5 VERDICT #2: the 21/21 headline claim table rested on Orbax
checkpoint dirs (`runs/<token>/`) that are gitignored and cleaned at round
boundaries — round 4 lost every arm mid-queue and burned a large fraction
of its chip time on rebuild roulette.  This script freezes the params of
every arm present on disk into single-file float32 npz archives
(`dl_ofdm_tpu.train.checkpoint.export_params_npz`) inside the COMMITTED
`runs/arms/` directory, with a MANIFEST.json recording provenance (recipe,
gate status, which CSV families each arm backs).

`runs/resweep_claims.py` then regenerates the claim-table cells from these
archives with zero training.

Reference analog: the TF1 checkpoints committed under `test_v1/model/`
(`test_v1/test_ofdm_cdnn_awgn.py:64-85` restores them for cross-checks).

CPU-only (Orbax raw restore; no chip needed).  Idempotent: existing npz
files are skipped unless --force.
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dl_ofdm_tpu.train import checkpoint as ckpt  # noqa: E402

RUNS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs")
ARMS = os.path.join(RUNS, "arms")


def _raw_params(ckpt_dir):
    """Raw Orbax restore -> params dict.

    Checkpoints here are TrainState sequences [params, opt_state, step]
    (`train/loop.py::TrainState`); resume payloads (dict with 'state') are
    handled for completeness."""
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(ckpt_dir)
    if isinstance(restored, dict) and "state" in restored:
        return restored.get("best_params") or restored["state"][0]
    return restored[0]


# provenance of each surviving dir, reconstructed from the round-4 rebuild
# markers (p17_rebuild_*/p18_*): which arm actually sits at each canonical
# name, and which CSV families (claim-table tags) it backs.  The round-4
# recovery saved gate-FAILED fresh tail arms at the canonical mobile names
# for 1mod/2mod (ADVICE r4 #1) — their sweeps live under the
# `mixRayleighTail` tag and the canonical `mixRayleigh` CSVs belong to arms
# that no longer exist anywhere.
def _role(name):
    m = re.match(r"OFDM_Dense3_(\d)mod_snr\d+_cp(True|False)"
                 r"(_Equalizer(\d+)_([A-Za-z]+))?(_mobile)?(_tail)?$", name)
    if not m:
        return None
    nbits = int(m.group(1))
    mobile = bool(m.group(6))
    is_tail = bool(m.group(7))
    if not m.group(3):
        return {"kind": "awgn_base", "nbits": nbits,
                "backs": [f"Test_DCCN_{name}_AWGN.csv"]}
    opt, mix = int(m.group(4)), m.group(5)
    info = {"kind": "equalizer", "nbits": nbits, "mobile": mobile,
            "opt": opt, "train_mix": mix}
    # gate status from the rebuild markers.  Phase-19 markers
    # (zfrebuild/zfcontinue/opt0rebuild, per-seed) record `saved_as`
    # explicitly: one whose saved_as == this canonical name describes the
    # arm that actually sits here and OVERRIDES the round-4 p17/p18
    # provenance (a later gate-PASS rebuild replaces the dir the old
    # marker described — e.g. the 2mod-mobile static-to-mobile
    # continuation over the p17 tail rebuild).
    suffix = "_mobile" if mobile else ""
    base = re.sub(r"_Equalizer.*$", "", name)
    # p19 marker filenames carry the bare base token (no _mobile suffix);
    # the saved_as equality below is what ties a marker to this dir
    p19 = [q for tag in ("p19_zfcontinue", "p19_zfrebuild",
                         "p19_opt0rebuild")
           for q in sorted(glob.glob(
               os.path.join(RUNS, f"{tag}_{base}_s*.json")))]
    claimed = False
    for q in p19:
        d = json.load(open(q))
        if d.get("saved_as") == name:
            info["recipe"] = d.get("recipe")
            info["gate_pass"] = d.get("gate_pass")
            claimed = True
    if not claimed:
        for tag in ("p18_graftrebuild", "p18_xrebuild", "p17_rebuild"):
            p = os.path.join(RUNS, f"{tag}_{base}{suffix}.json")
            if os.path.isfile(p):
                d = json.load(open(p))
                if d.get("saved_as") not in (None, name) \
                        and tag != "p17_rebuild":
                    continue   # marker describes an aside arm, not this dir
                info["recipe"] = d.get("recipe")
                info["gate_pass"] = d.get("gate_pass")
                break
    if is_tail or info.get("gate_pass") is False:
        # gate-failed fresh arm parked at the canonical name: its sweeps
        # live under the Tail tag (run_experiments17.tagsweep)
        info["sweep_tag"] = "mixRayleighTail"
        info["backs"] = _sweep_files(base, opt, "mixRayleighTail", mobile)
        info["note"] = ("canonical mixRayleigh CSVs of this config belong "
                        "to a LOST arm (round-4 checkpoint cleanup); this "
                        "npz is the extended-tail-curriculum rebuild, swept "
                        "under the mixRayleighTail tag")
    else:
        info["sweep_tag"] = mix
        info["backs"] = _sweep_files(base, opt, mix, mobile)
    return info


def _sweep_files(base, opt, mix, mobile):
    suffix = "_mobile" if mobile else ""
    files = glob.glob(os.path.join(
        RUNS, f"Test_DCCN_{base}_Equalizer{opt}_{mix}"
              f"_test_chan_*{suffix}.csv"))
    if not mobile:   # '*' would also swallow '<chan>_mobile'
        files = [f for f in files if not f.endswith("_mobile.csv")]
    return sorted(os.path.basename(f) for f in files)


def main(force=False):
    os.makedirs(ARMS, exist_ok=True)
    manifest_path = os.path.join(ARMS, "MANIFEST.json")
    manifest = json.load(open(manifest_path)) if os.path.isfile(
        manifest_path) else {}
    for d in sorted(glob.glob(os.path.join(RUNS, "OFDM_Dense3_*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        if name.endswith(("_p17fresh", "_p18x", "_p18g")):
            continue   # quarantined/aside arms back no shipped number
        out = os.path.join(ARMS, name + ".npz")
        role = _role(name)
        if role is None:
            print(f"skip {name}: unrecognized name schema")
            continue
        if os.path.isfile(out) and not force:
            print(f"skip {name}: npz exists")
        else:
            params = _raw_params(d)
            ckpt.export_params_npz(out, params)
            n_arr = len(jax.tree_util.tree_leaves(params))
            print(f"exported {name}: {n_arr} arrays, "
                  f"{os.path.getsize(out)/1e6:.2f} MB")
        role["npz"] = os.path.basename(out)
        role["sha_source_dir"] = name
        manifest[name] = role
    # archive-only entries (checkpoint dir cleaned at a round boundary):
    # refresh the marker-derived metadata too, so a gate-PASS rebuild
    # recorded after the dir vanished still corrects recipe/gate/tag
    for name, old in list(manifest.items()):
        if os.path.isdir(os.path.join(RUNS, name)):
            continue
        role = _role(name)
        if role is None:
            continue
        role["npz"] = old.get("npz", name + ".npz")
        role["sha_source_dir"] = old.get("sha_source_dir", name)
        manifest[name] = role
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {manifest_path} ({len(manifest)} arms)")


if __name__ == "__main__":
    main(force="--force" in sys.argv)
