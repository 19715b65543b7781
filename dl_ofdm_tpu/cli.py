"""Command-line entry points — flag-parity with the reference programs.

  python -m dl_ofdm_tpu.cli train      ... (ofdmreceiver_np.py equivalent)
  python -m dl_ofdm_tpu.cli equalizer  ... (ofdmreceiver_np_mp.py equivalent)
  python -m dl_ofdm_tpu.cli baseline   ... (OFDM_Benchmark_dev.m equivalent)
  python -m dl_ofdm_tpu.cli sweep      ... (run_local_ofdm.py equivalent)

Flags mirror the reference `tf.app.flags` (`dev/py/ofdmreceiver_np.py:30-53`,
`dev/py/ofdmreceiver_np_mp.py:32-59`); booleans accept True/False strings the
same way.
"""
from __future__ import annotations

import argparse
import os
import sys


def _bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "t", "yes")


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--nbits", type=int, default=1)
    p.add_argument("--nfft", type=int, default=64)
    p.add_argument("--nsymbol", type=int, default=7)
    p.add_argument("--npilot", type=int, default=8)
    p.add_argument("--nguard", type=int, default=8)
    p.add_argument("--nfilter", type=int, default=64)
    p.add_argument("--pilot", default="lte",
                   choices=["lte", "scattered", "block", "comb"])
    p.add_argument("--cp", type=_bool, default=True)
    p.add_argument("--longcp", type=_bool, default=True)
    p.add_argument("--compute_dtype", default=None,
                   choices=[None, "bfloat16", "float32"])
    p.add_argument("--channel", default="AWGN")
    p.add_argument("--mobile", type=_bool, default=False)
    p.add_argument("--SNR", type=float, default=3.0)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--msg_length", type=int, default=100800)
    p.add_argument("--max_epoch_num", type=int, default=1000)
    p.add_argument("--early_stop", type=int, default=100)
    p.add_argument("--init_learning", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--token", default="OFDM")
    p.add_argument("--save_dir", default="./output/")
    p.add_argument("--opt", type=int, default=0)
    p.add_argument("--test", type=_bool, default=False)
    p.add_argument("--load_model", default="",
                   help="checkpoint path to warm-start params/opt state from "
                        "(reference --load_model, ofdmreceiver_np.py:197-203)")
    p.add_argument("--ckpt_every", type=int, default=50,
                   help="epochs between mid-run resume checkpoints (written "
                        "to <save_dir>/<token>.../resume; 0 disables)")
    p.add_argument("--curriculum_tail", type=_bool, default=False,
                   help="equalizer stage: extended-tail SNR curriculum "
                        "(0-33 dB, mass shifted to 27-33; see "
                        "train/curriculum.py)")


def _configs(args):
    from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
    cfg = OFDMConfig(nbits=args.nbits, nfft=args.nfft, nsymbol=args.nsymbol,
                     npilot=args.npilot, nguard=args.nguard,
                     nfilter=args.nfilter, pilot=args.pilot, cp=args.cp,
                     longcp=args.longcp, compute_dtype=args.compute_dtype)
    tc = TrainConfig(snr=args.SNR, batch_size=args.batch_size,
                     msg_length=args.msg_length,
                     max_epoch_num=args.max_epoch_num,
                     early_stop=args.early_stop,
                     init_learning=args.init_learning, seed=args.seed,
                     token=args.token, save_dir=args.save_dir, opt=args.opt,
                     curriculum_tail=args.curriculum_tail)
    return cfg, tc


def cmd_train(args):
    """Basic DCCN training + final BER sweep (ofdmreceiver_np.py parity)."""
    import jax
    from dl_ofdm_tpu.eval.sweep import ber_sweep
    from dl_ofdm_tpu.train import checkpoint as ckpt
    from dl_ofdm_tpu.train.loop import Trainer

    cfg, tc = _configs(args)
    trainer = Trainer(cfg, tc, channel=args.channel, mobile=args.mobile)
    path = os.path.join(tc.save_dir, tc.token)
    if args.test:
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = ckpt.restore(path, state)
        params = state.params
    else:
        init_state = None
        if args.load_model:
            init_state = ckpt.restore(
                args.load_model, trainer.init_state(jax.random.PRNGKey(0)))
        state, info = trainer.fit(
            init_state=init_state,
            ckpt_dir=(path + '.wip') if args.ckpt_every > 0 else None,
            ckpt_every=args.ckpt_every or 50)
        params = state.params
        ckpt.save(path, state)
        print(f"Training done, best epoch {info['best_epoch']}; saved {path}")
    res = ber_sweep(trainer, params, jax.random.PRNGKey(tc.seed + 999))
    csv = res.to_csv(f"Test_DCCN_{tc.token}_{args.channel}.csv")
    print(f"wrote {csv}")


def cmd_equalizer(args):
    """Equalizer transfer learning + cross-channel sweep
    (ofdmreceiver_np_mp.py parity)."""
    import jax
    from dl_ofdm_tpu.eval.sweep import cross_channel_sweep
    from dl_ofdm_tpu.train import checkpoint as ckpt
    from dl_ofdm_tpu.train.equalizer_loop import EqualizerTrainer
    from dl_ofdm_tpu.train.loop import Trainer

    cfg, tc = _configs(args)
    base_path = os.path.join(tc.save_dir, tc.token)
    # load pretrained AWGN receiver
    base = Trainer(cfg, tc, channel="AWGN")
    base_state = base.init_state(jax.random.PRNGKey(0))
    base_state = ckpt.restore(base_path, base_state)

    trainer = EqualizerTrainer(cfg, tc, channel=args.channel,
                               mobile=args.mobile,
                               pretrained_rx=base_state.params)
    save_name = f"{tc.token}_Equalizer{tc.opt}_{args.channel}"
    eq_path = os.path.join(tc.save_dir, save_name)
    if args.test:
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = ckpt.restore(eq_path, state)
    else:
        init_state = None
        if args.load_model:
            init_state = ckpt.restore(
                args.load_model, trainer.init_state(jax.random.PRNGKey(0)))
        state, info = trainer.fit(
            init_state=init_state,
            ckpt_dir=(eq_path + '.wip') if args.ckpt_every > 0 else None,
            ckpt_every=args.ckpt_every or 50)
        ckpt.save(eq_path, state)
        print(f"Equalizer training done, best epoch {info['best_epoch']}")

    def make_trainer(chan, mobile):
        t = EqualizerTrainer(cfg, tc, channel=chan, mobile=mobile,
                             pretrained_rx=base_state.params)
        return t

    cross_channel_sweep(make_trainer, state.params,
                        jax.random.PRNGKey(tc.seed + 777), tc.token, tc.opt,
                        args.channel, mobile=args.mobile)


def cmd_baseline(args):
    """Classical estimator benchmark (OFDM_Benchmark_dev.m parity)."""
    from dl_ofdm_tpu.baselines.classical_rx import run_benchmark
    from dl_ofdm_tpu.ofdm.plan import build_plan

    cfg, tc = _configs(args)
    plan = build_plan(cfg)
    run_benchmark(plan, args.channel, args.opt or 1, longcp=args.longcp,
                  mobile=args.mobile, n_frames=args.frames,
                  save_dir=args.save_dir, per_sample=args.per_sample)


def cmd_sweep(args):
    from dl_ofdm_tpu.runner import run_sweep
    run_sweep(awgn=args.awgn, save_dir=args.save_dir, quick=args.quick)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="dl_ofdm_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, fn in (("train", cmd_train), ("equalizer", cmd_equalizer),
                     ("baseline", cmd_baseline), ("sweep", cmd_sweep)):
        p = sub.add_parser(name)
        _add_common(p)
        if name == "baseline":
            p.add_argument("--frames", type=int, default=20000)
            p.add_argument("--per_sample", type=_bool, default=False,
                           help="MATLAB-exact per-sample time-varying "
                                "mobile fading (vs symbol-averaged kernel)")
        if name == "sweep":
            p.add_argument("--awgn", type=_bool, default=True)
            p.add_argument("--quick", type=_bool, default=False)
        p.set_defaults(fn=fn)
    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
