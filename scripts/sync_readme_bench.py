"""Regenerate README.md's measured-performance bullet from a bench artifact.

Round-2 VERDICT item 4: README quoted round-1 numbers while the committed
bench artifact measured something else.  This script makes the coupling
mechanical: it rewrites the block between `<!-- bench:begin -->` and
`<!-- bench:end -->` in README.md from the given bench JSON (a BENCH_r*.json
driver artifact with a "parsed" field, or a raw `python bench.py` JSON
line).  Run it whenever a new bench lands:

    python scripts/sync_readme_bench.py [path/to/bench.json]

Defaults to the newest BENCH_r*.json in the repo root.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- bench:begin -->", "<!-- bench:end -->"


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    return data.get("parsed", data)


def render(d: dict, src: str) -> str:
    lines = [
        BEGIN,
        f"* end-to-end training pipeline (bits -> TX -> Rayleigh -> AWGN -> "
        f"DCCN fwd+bwd -> Adam, one XLA program): "
        f"**{d['train_ms_per_step']:.2f} ms/step @ "
        f"{d['train_batch_frames']} frames = "
        f"{d['value'] / 1e9:.2f}G IQ samples/s/chip** — "
        f"**{d['vs_baseline']:.0f}x** the reference pipeline architecture "
        f"measured on the same machine (host-NumPy data plane + identical "
        f"device step; host->device copy excluded, so conservative);",
    ]
    if d.get("headline_grad_path"):
        ctl = d.get("fused_train_control") or {}
        verdicts = ", ".join(f"{k.replace('_verdict', '')}: {v}"
                             for k, v in ctl.items() if k.endswith("verdict"))
        lines.append(
            f"* headline gradient path: **{d['headline_grad_path']}** "
            f"(fused-kernel eligibility gated on the matched-seed training "
            f"control{', ' + verdicts if verdicts else ''});")
    elif d.get("headline_dtype"):   # pre-round-5 artifacts
        ctl = d.get("bf16_train_control") or {}
        lines.append(
            f"* headline step activations: **{d['headline_dtype']}** "
            f"(bf16 eligibility gated on the matched-seed training control"
            f"{': ' + ctl['verdict'] if ctl.get('verdict') else ''});")
    for key, label in (("per_batch_size", "fused-f32"),
                       ("per_batch_size_bf16", "fused-bf16"),
                       ("per_batch_size_xla", "xla-autodiff")):
        per = d.get(key)
        if per:
            cells = ", ".join(
                f"{bf}: {v['ms_per_step']} ms ({v['g_iq_per_sec']}G)"
                for bf, v in sorted(per.items(), key=lambda kv: int(kv[0])))
            lines.append(
                f"* per-batch-size {label} (frames: ms/step, G IQ/s): "
                f"{cells};")
    spread = d.get("repeatability_spread_max_over_min")
    if spread:
        worst = max(spread.values())
        lines.append(
            f"* repeatability: interleaved min-of-k protocol, max/min "
            f"spread across rounds <= x{worst} (worst step);")
    rf = d.get("roofline_vs_v5e_peaks")
    if rf:
        # XLA cost analysis cannot see inside a Pallas kernel: when the
        # winning step is the fused kernel, the reported FLOP count covers
        # only the XLA-visible glue ops and the HBM bytes are the kernel's
        # true external traffic — say so instead of printing a bogus 0%.
        fused_win = "fused" in str(d.get("headline_grad_path", ""))
        if fused_win:
            lines.append(
                f"* winning (fused-kernel) train step external HBM "
                f"traffic: {rf['hbm_gb_per_sec']} GB/s "
                f"({rf['pct_hbm_peak']}% of ~819 GB/s) — the step is no "
                f"longer bandwidth-bound (the XLA-autodiff step ran at "
                f"~80% of HBM peak); XLA cost analysis cannot count "
                f"FLOPs inside the Pallas kernel, so no MXU utilization "
                f"figure is reported here;")
        else:
            lines.append(
                f"* winning train step vs v5e peaks (XLA cost analysis): "
                f"{rf['tflops_per_sec']} TFLOP/s ({rf['pct_bf16_peak']}% of "
                f"bf16 peak), {rf['hbm_gb_per_sec']} GB/s HBM "
                f"({rf['pct_hbm_peak']}% of ~819 GB/s);")
    # the forward-only microbenchmark is dispatch-noise-prone on this
    # tunneled backend once many executables are co-resident (round-5
    # measurements ranged 2.4-138 G for the identical program; 138 G
    # exceeds the hardware's compute-peak bound, so the timing, not the
    # program, moved) — flag any physically impossible reading
    PEAK_FWD_G = 80.0   # ~197 TFLOP/s bf16 / ~1.4 MFLOP-per-frame bound
    sus = (d["fwd_iq_per_sec"] / 1e9 > PEAK_FWD_G
           or d["fwd_bf16_iq_per_sec"] / 1e9 > PEAK_FWD_G)
    lines.append(
        f"* receiver forward alone: "
        f"**{d['fwd_iq_per_sec'] / 1e9:.1f}G IQ samples/s/chip** "
        f"(bf16 activations: {d['fwd_bf16_iq_per_sec'] / 1e9:.1f}G), "
        f"{1 / d['fwd_vs_conv3d_formulation']:.2f}x step time of the "
        f"reference's conv3d-over-depth formulation on the same device "
        f"= {d['fwd_vs_conv3d_formulation']:.1f}x faster"
        + (" — UNRELIABLE this run: exceeds the compute-peak bound, a "
           "co-resident-executable timing artifact (aux metric; the "
           "headline uses the interleaved protocol)" if sus else "")
        + ";")
    lines.append(f"  <sub>source artifact: `{src}` "
                 f"(regenerate with `python scripts/sync_readme_bench.py`)"
                 f"</sub>")
    lines.append(END)
    return "\n".join(lines)


def main():
    if len(sys.argv) > 1:
        src = sys.argv[1]
    else:
        # newest by mtime across driver artifacts AND the live local bench
        # (a fresh `python bench.py` writes runs/bench_local.json — picking
        # a stale BENCH_r*.json over it silently reverts the README)
        cands = (glob.glob(os.path.join(ROOT, "BENCH_r*.json")) +
                 glob.glob(os.path.join(ROOT, "runs", "bench_local.json")))
        if not cands:
            raise SystemExit("no bench artifact found and no path given")
        src = max(cands, key=os.path.getmtime)
    block = render(load(src), os.path.basename(src))
    rp = os.path.join(ROOT, "README.md")
    text = open(rp).read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        raise SystemExit(f"README.md has no {BEGIN}...{END} block")
    open(rp, "w").write(pat.sub(lambda m: block, text))
    print(f"README.md bench block regenerated from {src}")


if __name__ == "__main__":
    main()
