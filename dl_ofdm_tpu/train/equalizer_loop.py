"""Equalizer fine-tuning stage (transfer learning) — the TPU-native version of
`dev/py/ofdmreceiver_np_mp.py main()`.

Flow parity:
  1. pretrain a DCCN receiver on AWGN (train.loop.Trainer);
  2. build an EqualizedReceiver, graft the pretrained receiver params in
     (replaces the TF1 graph surgery, `ofdmreceiver_np_mp.py:264-322`);
  3. train ONLY the Equalizer scope with fresh Adam state
     (optax.masked == `var_list=trainable_vars` + re-init, `:346-371`);
  4. per-frame SNR curriculum linspace(0,27,10) with the reference pmf
     (`:386,405`);
  5. channel: mixRayleigh (or per-flag), RayleighChanParallel -> batched
     vectorized channel; mobile adds mixed Jakes Doppler (`:389-391`);
  6. diagnostics: SNR-estimate MSE and layernormed channel-estimate MSE vs
     ground truth (`:324-333`).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.models.equalizers import EQUALIZER_REGISTRY
from dl_ofdm_tpu.models.receiver import EqualizedReceiver
from dl_ofdm_tpu.ops.norms import frame_layer_norm
from dl_ofdm_tpu.train import metrics as M
from dl_ofdm_tpu.train.curriculum import modulation_offset_db, sample_snr
from dl_ofdm_tpu.train.loop import Trainer, TrainState
from dl_ofdm_tpu.train.transfer import graft_pretrained, masked_optimizer


# batch threshold (frames/step) above which the fused Pallas data plane is
# worth its compile cost in the curriculum loop (see __init__ note)
FUSED_CURRICULUM_MIN_FRAMES = 1024


class EqualizerTrainer(Trainer):
    """Trainer for the equalized receiver with a frozen pretrained DCCN."""

    def __init__(self, cfg: OFDMConfig, tc: TrainConfig,
                 channel: str = "mixRayleigh", mobile: bool = False,
                 mix: Optional[bool] = None,
                 pretrained_rx: Any = None, eq_spec: Any = None,
                 mesh: Any = None, freeze_rx: bool = True):
        spec = EQUALIZER_REGISTRY[tc.opt] if eq_spec is None else eq_spec
        from dl_ofdm_tpu.ofdm.plan import build_plan
        plan_probe = build_plan(cfg)
        model = EqualizedReceiver(
            nbits=cfg.nbits, nfft=cfg.nfft, cp_len=plan_probe.cp_len,
            nfilter=cfg.nfilter, frame_size=plan_probe.frame_size,
            nsymbol=plan_probe.nsymbol, pilot_size=plan_probe.pilot_size,
            pilot_carriers=tuple(plan_probe.pilot_carriers),
            keep_cp=cfg.cp, eq_spec=spec,
            compute_dtype=cfg.compute_dtype)
        super().__init__(cfg, tc, channel=channel, mobile=mobile, mix=mix,
                         model=model, mesh=mesh)
        self.pretrained_rx = pretrained_rx
        # freeze everything outside the Equalizer scope (reference parity,
        # `ofdmreceiver_np_mp.py:346-371`); freeze_rx=False is an extension
        # that fine-tunes the grafted receiver jointly with the equalizer
        self.freeze_rx = freeze_rx
        self._eq_reg_coeff = 1e-3   # `ofdmreceiver_np_mp.py:338`
        # modulation-aware curriculum shift (see train/curriculum.py); the
        # reference grid (offset 0) is exact parity for its only equalizer
        # config, BPSK.
        self._snr_offset = (tc.curriculum_offset
                            if tc.curriculum_offset is not None
                            else modulation_offset_db(cfg.nbits))
        # fused data plane for the curriculum: AUTO above a batch threshold
        # for STATIC mixes (round-5 VERDICT #6).  History: the round-3
        # single-seed control (`runs/p14_doppler_control.json`) read as a
        # training-quality FAIL for the fused Doppler plane; the round-4
        # root-cause (`runs/p15_doppler_rootcause.json`,
        # scripts/doppler_rootcause.py) EXONERATED the kernel — on-chip
        # distribution probes (ZF self-consistency EVM, H autocorrelation
        # vs the analytic sum-of-sinusoids, noise moments) match the jnp
        # oracle exactly, and a 3-arm x 2-seed control showed the FAIL was
        # seed-to-seed training variance.  With correctness settled, the
        # default is economics + toolchain: at the reference batch
        # (73 frames/step) the kernel's edge is negligible vs its first
        # Mosaic compile; and on this image the curriculum variant does
        # not COMPILE at all — the AOT compile helper SIGKILLs the Mosaic
        # compile of the mobile in-kernel-H variant (787 KB MLIR, 2/2)
        # AND the static mixRayleigh variant at every probed batch
        # (512/1024/2048 frames/step, runs/p19_fused_compile_probe.json),
        # so the planned >=FUSED_CURRICULUM_MIN_FRAMES auto-enable can
        # never be satisfied here.  Default off; assign the attribute to
        # opt in where the toolchain can compile it (the CPU interpreter
        # path used by the tests, or a TPU image with an in-process
        # compiler).  The fused plane remains load-bearing for the basic
        # Trainer (bench headline), whose smaller module compiles fine.
        self.fused_curriculum = False

    def _install_optimizer(self, params) -> None:
        """Build the Equalizer-scope-masked optimizer + gradient mask for a
        given param tree (only its structure matters)."""
        if not self.freeze_rx:
            from dl_ofdm_tpu.train.loop import make_optimizer
            self.optimizer = make_optimizer(self.tc)
            self._grad_mask = None
            return
        self.optimizer, mask = masked_optimizer(self.tc, params, "Equalizer")
        self._grad_mask = jax.tree.map(
            lambda m: jnp.asarray(1.0 if m else 0.0), mask)

    def init_state(self, key: jax.Array) -> TrainState:
        dummy = jnp.zeros(
            (2, self.plan.nsymbol, self.plan.samples_per_symbol, 2),
            jnp.float32)
        params = self.model.init(key, dummy)["params"]
        if self.pretrained_rx is not None:
            params = graft_pretrained(params, self.pretrained_rx)
        if self.mesh is not None:
            params = self._shard_state_params(params)
        self._install_optimizer(params)
        state = TrainState(params=params,
                           opt_state=self.optimizer.init(params),
                           step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = self._place_on_mesh(state)
        return state

    # -- loss with equalizer-stage coefficients and diagnostics --------------
    def _loss_fn(self, params, bits, rx_in, h_freq=None, snr_db=None):
        logits, _, _, snr_est, chest = self.model.apply(
            {"params": params}, rx_in)
        ce = M.cross_entropy(logits, bits, self.tc.double_softmax)
        reg = M.l2_regularization(params)
        pred = M.bit_predictions(logits)
        conf = M.confusion_matrix(bits, pred)
        log_ber, ber = M.ber_from_confusion(conf)
        loss = ce + self._eq_reg_coeff * reg
        aux = {"ce": ce, "ber": ber, "log_ber": log_ber, "conf": conf,
               "total_loss": loss}
        if snr_db is not None:
            # reference parity: snr_est is the log10-without-x10 estimate
            # (`dev/py/model.py:464-475`) compared against the dB feed, same
            # unit mismatch as the reference's snr_mse diagnostic — a large
            # constant offset; tracks relative movement only.
            aux["snr_mse"] = jnp.mean((snr_est - snr_db.reshape(-1, 1)) ** 2)
        if h_freq is not None:
            aux["chan_mse"] = jnp.mean(
                (frame_layer_norm(h_freq) - frame_layer_norm(chest)) ** 2)
        return loss, aux

    # -- steps with SNR curriculum -------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def train_step_curriculum(self, state: TrainState, key: jax.Array):
        ks, key = jax.random.split(key)
        snr_db = sample_snr(ks, self.batch_frames, self._snr_offset,
                            tail=self.tc.curriculum_tail)
        # Fused data plane (incl. in-kernel ground-truth H): OPT-IN only
        # (see __init__ — the matched-seed training control failed for the
        # fused Doppler plane, so the jnp chain is the default everywhere).
        if self.mesh is not None:
            bits, rx_in, h_freq, noise_pwr = self._synth_mesh(key, snr_db)
        elif (self._fused_synth_spec is not None
              and getattr(self, "emulated_curriculum", False)):
            # diagnostic plane (scripts/doppler_rootcause.py): the fused
            # kernel's EXACT math with jax.random bits — isolates
            # kernel-math deltas from PRNG-stream deltas in the
            # fused-vs-jnp training-quality comparison
            from dl_ofdm_tpu.ops.fused_synth import emulate_fused_synthesize
            bits, rx_in, noise_pwr, h_freq = emulate_fused_synthesize(
                self._fused_synth_spec, self.batch_frames, key, snr_db,
                want_h=True)
        elif self._use_fused_synth and getattr(self, "fused_curriculum", False):
            from dl_ofdm_tpu.ops.fused_synth import fused_synthesize
            bits, rx_in, noise_pwr, h_freq = fused_synthesize(
                self._fused_synth_spec, self.batch_frames, key, snr_db,
                want_h=True)
        else:
            bits, rx_in, h_freq, noise_pwr, _ = self.synthesize(
                key, self.batch_frames, snr_db)
        (loss, aux), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state.params, bits, rx_in,
                                         h_freq, snr_db)
        if self._grad_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, self._grad_mask)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        aux.update(loss=loss, noise_power=noise_pwr)
        return TrainState(new_params, opt_state, state.step + 1), aux

    def fit(self, seed: int = None, max_epochs: int = None, log_fn=print,
            init_state: TrainState = None,
            ckpt_dir: str = None, ckpt_every: int = 50):
        """`init_state` warm-starts from a restored checkpoint; `ckpt_dir`
        enables crash-resumable training (see `Trainer.fit`)."""
        tc = self.tc
        seed = tc.seed if seed is None else seed
        max_epochs = tc.max_epoch_num if max_epochs is None else max_epochs
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        if init_state is not None:
            self._install_optimizer(init_state.params)
            state = init_state
        else:
            state = self.init_state(k0)
        steps_per_epoch = max(1, tc.frames_per_epoch(self.cfg.nsymbol) // self.batch_frames)
        state, key, start_epoch, best_loss, best_epoch, best_params, res = \
            self._maybe_resume(ckpt_dir, state, key)
        if res:
            log_fn(f"resumed from {ckpt_dir}/resume at epoch {start_epoch}")
        history = []
        for epoch in range(start_epoch, max_epochs):
            losses = []
            for _ in range(steps_per_epoch):
                key, k = jax.random.split(key)
                state, aux = self.train_step_curriculum(state, k)
                losses.append(aux["ce"])
            epoch_loss = float(jnp.mean(jnp.stack(losses)))
            key, ks, k = jax.random.split(key, 3)
            val = self.eval_step(state.params, k, 1024,
                                 sample_snr(ks, 1024, self._snr_offset,
                                            tail=self.tc.curriculum_tail))
            history.append({"epoch": epoch, "train_loss": epoch_loss,
                            "val_ber": float(val["ber"])})
            log_fn(f"epoch {epoch}: train_ce={epoch_loss:.5f} "
                   f"val_ber={float(val['ber']):.6f}")
            if epoch_loss < best_loss:
                best_loss, best_epoch = epoch_loss, epoch
                best_params = state.params
            if ckpt_dir is not None and (epoch + 1) % ckpt_every == 0:
                self._save_resume(ckpt_dir, state, key, epoch, best_loss,
                                  best_epoch, best_params)
            if epoch - tc.early_stop > best_epoch:
                break
        state = TrainState(best_params, state.opt_state, state.step)
        return state, {"best_epoch": best_epoch, "best_loss": best_loss,
                       "history": history}
