"""Jitted end-to-end training/eval: the whole link is ONE XLA program.

TPU-native re-design of the reference training loop
(`dev/py/ofdmreceiver_np.py:194-283`): where the reference generates bits,
waveform, fading and noise on the host each epoch and feeds minibatches
through a feed-dict (`:230-234`), here a single jitted `train_step` draws the
bits with `jax.random`, modulates, fades, adds noise, runs the receiver,
computes loss/metrics and applies the optimizer update — no host<->device
copies in steady state.

Optimizer parity: Adam with staircase exponential LR decay
(0.001, x0.98 every 500 steps — `ofdmreceiver_np.py:185-189`); total loss is
CE + stop_grad(BER) * reg_coeff * L2(reg'd params); the reference also adds
1.0 * log(BER) through a non-differentiable confusion-matrix path, so (as
there) gradients flow only through CE + regularization — the log-BER term is
reported as a metric (`SURVEY.md` section 7.3).
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from dl_ofdm_tpu.channel.awgn import awgn_channel
from dl_ofdm_tpu.channel.rayleigh import RayleighChannel
from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.models.dccn import DCCNReceiver
from dl_ofdm_tpu.ofdm.plan import build_plan
from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames_iq
from dl_ofdm_tpu.ops.fused_synth import build_synth_spec, fused_synthesize
from dl_ofdm_tpu.ops.norms import batch_norm_ref
from dl_ofdm_tpu.train import metrics as M

Params = Any


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=tc.init_learning, transition_steps=tc.lr_decay_steps,
        decay_rate=tc.lr_decay_rate, staircase=True)
    opt = optax.adam(learning_rate=schedule)
    if tc.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_clip), opt)
    return opt


class Trainer:
    """End-to-end trainer for the basic DCCN receiver (AWGN or fading)."""

    def __init__(self, cfg: OFDMConfig, tc: TrainConfig, channel: str = "AWGN",
                 mobile: bool = False, mix: Optional[bool] = None,
                 model: Optional[Any] = None,
                 param_label_fn: Optional[Callable] = None,
                 mesh: Optional[Any] = None):
        # reference parity: mix channels apply Doppler only on the designated
        # frames and ONLY when mix is set (`dev/py/radio.py:460`); the
        # reference's mobile flow always constructs the mixed-Doppler channel,
        # so mobile implies mix unless explicitly overridden.
        mix = mobile if mix is None else mix
        self.cfg, self.tc = cfg, tc
        self.plan = build_plan(cfg)
        self.model = model if model is not None else DCCNReceiver(
            nbits=cfg.nbits, nfft=cfg.nfft, cp_len=self.plan.cp_len,
            nfilter=cfg.nfilter, frame_size=self.plan.frame_size,
            keep_cp=cfg.cp, compute_dtype=cfg.compute_dtype)
        self.channel = RayleighChannel(
            channel=channel, nfft=cfg.nfft,
            sample_rate=self.plan.sample_rate, mobile=mobile, mix=mix)
        self.tx = partial(ofdm_modulate_frames_iq, plan=self.plan)
        self.optimizer = make_optimizer(tc)
        self.batch_frames = max(1, tc.batch_size // cfg.nsymbol)
        self._grad_mask = None  # set by transfer learning
        # first-class mesh training (SURVEY §7.2 step 7): the data plane is
        # shard_mapped over 'dp' with per-device folded keys (same scheme as
        # the sharded sweep, eval/sweep.py), params/opt state carry the
        # parallel/mesh.py tp shardings, and XLA inserts the gradient
        # all-reduce over 'dp' from the shardings (GSPMD).
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["dp"]
            if self.batch_frames % dp:
                # round up so every dp shard gets equal frames
                self.batch_frames += dp - self.batch_frames % dp
        # fused Pallas synthesize (ops/fused_synth.py): covers single
        # profiles, AWGN passthrough, the mixRayleigh/mixAll per-frame
        # profile cycles, AND Jakes-Doppler (mobile) frames via the kernel's
        # per-symbol path.  Engaged on TPU backends only; the jnp chain
        # stays the oracle everywhere else.
        self._fused_synth_spec = None
        ch = self.channel
        # size gate: the kernel bakes the [frame_size, sps] TX operator pair
        # into VMEM alongside ~10 [blk, S*sps] working planes; past ~2 MB of
        # operator the kernel would blow the 16 MB scoped-VMEM budget (and
        # Mosaic compile time grows sharply), so big grids keep the jnp chain
        tx_op_bytes = 2 * 4 * self.plan.frame_size * self.plan.samples_per_symbol
        # block-type pilot plans put pilots on ENTIRE OFDM symbols
        # (`dev/py/ofdm.py:240-252`), leaving those symbols with zero data
        # subcarriers — the kernel's per-symbol constellation slice would be
        # zero-width (Mosaic rejects 0-sized vectors; found by the round-5
        # end-to-end pilot-scheme exercise).  Such plans keep the jnp chain.
        import numpy as _np0
        sym_counts = _np0.bincount(
            _np0.asarray(self.plan.data_sc) // cfg.nfft,
            minlength=self.plan.nsymbol)
        if cfg.nbits <= 4 and tx_op_bytes <= 2 * 2**20 \
                and sym_counts.min() > 0:
            import numpy as _np
            profs = [None if ch._passthrough[i] else p
                     for i, p in enumerate(ch.profiles)]
            fd = dop_cycle = None
            if ch.has_doppler:
                # static Doppler cycle: frame i -> Jakes path iff
                # _frame_doppler_mask says so; period = lcm(P, 3|4)
                per = {"mixrayleigh": 3, "mixall": 4}.get(ch.channel, 1)
                cyc_len = int(_np.lcm(len(ch.profiles), per))
                dop_cycle = ch._frame_doppler_mask(
                    cyc_len, ch._frame_profiles(cyc_len))
                fd = ch._fd_np
            self._fused_synth_spec = build_synth_spec(
                self.plan, profs, cfg.nbits, fd=fd, dop_cycle=dop_cycle)
        self._use_fused_synth = (
            self._fused_synth_spec is not None
            and self.mesh is None  # fused kernel is per-device; the mesh
                                   # path shard_maps the jnp chain instead
            and jax.default_backend() in ("tpu", "axon"))
        # fused model fwd+bwd (ops/fused_model.py, round-5 VERDICT #1): the
        # whole DCCN forward+loss+backward runs as ONE Pallas kernel chained
        # off the synth kernel's raw planes — no logits/activations ever
        # reach HBM (the XLA fwd+bwd owned 87% of the step's 4 GB traffic).
        # Engaged for the stock DCCNReceiver on TPU; every other model/
        # config keeps the XLA autodiff path (which the CPU test suite pins
        # the kernel against).
        self._fused_model_spec = None
        if (self._use_fused_synth
                and type(self.model) is DCCNReceiver
                and self.model.recombine == "true"
                and self.model.compute_dtype is None
                and self.model.keep_cp
                and not tc.double_softmax
                and cfg.nbits <= 4):
            from dl_ofdm_tpu.ops.fused_model import ModelSpec
            self._fused_model_spec = ModelSpec(
                nsymbol=self.plan.nsymbol,
                sps=self.plan.samples_per_symbol,
                nfilter=cfg.nfilter, frame_size=self.plan.frame_size,
                nbits=cfg.nbits, fuse_norm=True,
                matmul_dtype=tc.fused_model_matmul_dtype)

    # -- state ---------------------------------------------------------------
    def init_state(self, key: jax.Array) -> TrainState:
        dummy = jnp.zeros(
            (2, self.plan.nsymbol, self.plan.samples_per_symbol, 2),
            jnp.float32)
        params = self.model.init(key, dummy)["params"]
        if self.mesh is not None:
            params = self._shard_state_params(params)
        state = TrainState(params=params,
                           opt_state=self.optimizer.init(params),
                           step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = self._place_on_mesh(state)
        return state

    # -- mesh plumbing --------------------------------------------------------
    def _shard_state_params(self, params):
        from dl_ofdm_tpu.parallel.mesh import shard_params
        return shard_params(self.mesh, params)

    def _place_on_mesh(self, tree):
        """Replicate any leaf still on the default device onto the mesh
        (params already carry their tp shardings; opt state mirrors them
        via zeros_like)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self.mesh

        def place(x):
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                return x
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.tree.map(place, tree)

    def _synth_mesh(self, key: jax.Array, snr_db: jnp.ndarray,
                    want_h: bool = False):
        """Data plane shard_mapped over 'dp': each device synthesizes its own
        frame shard from a fold_in(axis_index) key (eval/sweep.py scheme).
        Per-shard batch-norm statistics (the reference normalizes per feed
        batch; a dp shard IS a feed batch here)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        mesh = self.mesh
        dp = mesh.shape["dp"]
        local = self.batch_frames // dp

        def body(k, snr_local):
            k = jax.random.fold_in(k, jax.lax.axis_index("dp"))
            bits, rx_in, h_freq, npwr, _ = self.synthesize(
                k, local, snr_local)
            return bits, rx_in, h_freq, jax.lax.pmean(npwr, "dp")

        return shard_map(
            body, mesh=mesh, in_specs=(P(), P("dp")),
            out_specs=(P("dp"), P("dp"), P("dp"), P()),
            check_vma=False)(key, snr_db)

    # -- data pipeline (on device) ------------------------------------------
    def synthesize(self, key: jax.Array, n_frames: int, snr_db: jnp.ndarray,
                   norm_groups: jnp.ndarray | None = None,
                   normalize: bool = True):
        """bits -> waveform -> fading -> AWGN -> normalized receiver input.

        `norm_groups` [B, G] one-hot: per-group batch-norm statistics (used by
        the interleaved-SNR sweep for per-SNR-point protocol parity).
        `normalize=False` returns the raw post-AWGN waveform in place of
        `rx_in` so a caller can apply `batch_norm_ref` with externally
        aggregated moments (the mesh point_batch sweep psums them over dp)."""
        kb, kc, kn = jax.random.split(key, 3)
        # fair coin via the low bit of uint8 draws: 4x fewer generator bits
        # than bernoulli's f32-uniform compare (reference `util.py:25-34`
        # semantics — iid uniform bits — are unchanged)
        bits = jnp.bitwise_and(
            jax.random.bits(
                kb, (n_frames, self.plan.frame_size, self.cfg.nbits),
                jnp.uint8),
            jnp.uint8(1)).astype(jnp.int32)
        wf = self.tx(bits)                       # [B, S, K+CP, 2]
        ch = self.channel(kc, wf)
        y_iq, noise_pwr = awgn_channel(kn, ch.y, snr_db)
        rx_in = (batch_norm_ref(y_iq, group_onehot=norm_groups)
                 if normalize else y_iq)
        return bits, rx_in, ch.h_freq, noise_pwr, wf

    # -- loss ----------------------------------------------------------------
    def _loss_fn(self, params, bits, rx_in):
        out = self.model.apply({"params": params}, rx_in)
        # convention: every receiver returns logits first; aux outputs vary
        # by model (DCCN: fft_out; SingleGraphEqualizedRx: freq/eq/chest)
        logits = out[0] if isinstance(out, tuple) else out
        ce = M.cross_entropy(logits, bits, self.tc.double_softmax)
        reg = M.l2_regularization(params)
        pred = M.bit_predictions(logits)
        conf = M.confusion_matrix(bits, pred)
        log_ber, ber = M.ber_from_confusion(conf)
        loss = ce + jax.lax.stop_gradient(ber) * self.tc.reg_coeff * reg
        aux = {"ce": ce, "ber": ber, "log_ber": log_ber, "conf": conf,
               "total_loss": ce + ber * self.tc.reg_coeff * reg + log_ber}
        return loss, aux

    # -- steps ---------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, key: jax.Array,
                   snr_db: jnp.ndarray):
        if self._fused_model_spec is not None and self.mesh is None:
            return self._train_step_fused(state, key, snr_db)
        if self.mesh is not None:
            bits, rx_in, _, noise_pwr = self._synth_mesh(key, snr_db)
        elif self._use_fused_synth:
            bits, rx_in, noise_pwr = fused_synthesize(
                self._fused_synth_spec, self.batch_frames, key, snr_db)
        else:
            bits, rx_in, _, noise_pwr, _ = self.synthesize(
                key, self.batch_frames, snr_db)
        (loss, aux), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, bits, rx_in)
        if self._grad_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, self._grad_mask)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        aux.update(loss=loss, noise_power=noise_pwr)
        return TrainState(params, opt_state, state.step + 1), aux

    def _train_step_fused(self, state: TrainState, key: jax.Array,
                          snr_db: jnp.ndarray):
        """Fully fused step: synth kernel (raw planes) -> batch-stat combine
        -> fused model fwd+bwd kernel -> optimizer.  HBM sees only the raw
        planes once, the idx grid, params and grads (~9 KB/frame vs
        ~220 KB/frame for the XLA autodiff step)."""
        from dl_ofdm_tpu.ops.fused_model import dccn_fused_grads, reg_grads
        from dl_ofdm_tpu.ops.fused_synth import _combine_stats
        idx, yr, yi, nr, ni, stats = fused_synthesize(
            self._fused_synth_spec, self.batch_frames, key, snr_db, raw=True)
        _, c, noise_pwr, _ = _combine_stats(stats.sum(axis=0),
                                            self.batch_frames)
        grads, ce, conf = dccn_fused_grads(
            self._fused_model_spec, self.batch_frames, state.params,
            yr, yi, nr, ni, c, idx)
        log_ber, ber = M.ber_from_confusion(conf)
        reg = M.l2_regularization(state.params)
        loss = ce + jax.lax.stop_gradient(ber) * self.tc.reg_coeff * reg
        grads = jax.tree.map(
            lambda g, r: g + r, grads,
            reg_grads(state.params, ber, self.tc.reg_coeff))
        if self._grad_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, self._grad_mask)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        aux = {"ce": ce, "ber": ber, "log_ber": log_ber, "conf": conf,
               "total_loss": ce + ber * self.tc.reg_coeff * reg + log_ber,
               "loss": loss, "noise_power": noise_pwr}
        return TrainState(params, opt_state, state.step + 1), aux

    @partial(jax.jit, static_argnums=(0, 3))
    def eval_step(self, params, key: jax.Array, n_frames: int,
                  snr_db: jnp.ndarray):
        bits, rx_in, _, noise_pwr, wf = self.synthesize(key, n_frames, snr_db)
        _, aux = self._loss_fn(params, bits, rx_in)
        aux["noise_power"] = noise_pwr
        aux["iq_tx"] = wf.reshape(-1, 2)[:2048]
        aux["iq_rx"] = rx_in.reshape(-1, 2)[:2048]
        return aux

    # -- adaptive batch growth (reference C15, `ofdmreceiver_np.py:242-243`) -
    def _ideal_batch_frames(self, ber: float) -> int:
        """idealbatch = (min(200/BER, 9e5) / (55*nbits)) // 8, rounded DOWN
        to a power of two (<= the ideal) to bound the number of re-jits — a
        deliberate deviation: XLA compiles per static shape, and under-sizing
        the batch only costs steps, never memory."""
        ideal = int(min(200.0 / max(ber, 1e-6), 9e5) / (55 * self.cfg.nbits)) // 8
        if ideal <= self.batch_frames:
            return self.batch_frames
        target = min(ideal, 8192)
        snapped = 1
        while snapped < target:
            snapped *= 2
        return max(self.batch_frames, snapped // 2 if snapped > target else snapped)

    # -- crash-resume plumbing (shared with EqualizerTrainer.fit) ------------
    def _config_sig(self) -> str:
        """Hash of everything that shapes the training trajectory, stamped
        onto resume payloads so a rerun with changed hyperparameters refuses
        the stale payload instead of silently warm-starting from it."""
        import hashlib
        ch = self.channel
        parts = (type(self).__name__, repr(self.cfg), repr(self.tc),
                 getattr(ch, "channel", None), getattr(ch, "mobile", None),
                 getattr(ch, "mix", None), getattr(self, "freeze_rx", None),
                 getattr(self, "fused_curriculum", None))
        return hashlib.sha1(repr(parts).encode()).hexdigest()

    def _maybe_resume(self, ckpt_dir, state, key):
        """Restore a mid-run resume payload from `<ckpt_dir>/resume` if one
        exists; returns (state, key, start_epoch, best_loss, best_epoch,
        best_params, resumed)."""
        from dl_ofdm_tpu.train import checkpoint as ckpt
        rp = None if ckpt_dir is None else os.path.join(ckpt_dir, "resume")
        if rp is None or not ckpt.has_resume(rp):
            return state, key, 0, float("inf"), 0, state.params, False
        payload = ckpt.restore_resume(rp, state, key)
        # the signature is read from INSIDE the payload (atomic with it;
        # legacy payloads fall back to the sidecar — see checkpoint.py)
        saved_sig = payload.get("config_sig")
        if saved_sig is not None and saved_sig != self._config_sig():
            raise RuntimeError(
                f"resume payload at {rp} was written by a run with a "
                f"different configuration (sig {saved_sig[:12]} != "
                f"{self._config_sig()[:12]}); delete the stale payload or "
                f"use a fresh ckpt_dir")
        cur = payload["cursor"]
        self.batch_frames = int(cur["batch_frames"])
        return (payload["state"], jnp.asarray(payload["key"]),
                int(cur["epoch"]) + 1, float(cur["best_loss"]),
                int(cur["best_epoch"]), payload["best_params"], True)

    def _save_resume(self, ckpt_dir, state, key, epoch, best_loss,
                     best_epoch, best_params):
        from dl_ofdm_tpu.train import checkpoint as ckpt
        ckpt.save_resume(os.path.join(ckpt_dir, "resume"), state=state,
                         key=key, epoch=epoch, best_loss=best_loss,
                         best_epoch=best_epoch, best_params=best_params,
                         batch_frames=self.batch_frames,
                         config_sig=self._config_sig())

    # -- epoch driver (mirrors reference epoch/early-stop protocol) ----------
    def fit(self, seed: int = None, max_epochs: int = None,
            log_fn=print, grow_batch: bool = True,
            dump_constellations: bool = False,
            init_state: "TrainState" = None,
            ckpt_dir: str = None, ckpt_every: int = 50) -> tuple[TrainState, dict]:
        """`init_state` warm-starts from a restored checkpoint (resume
        semantics the reference gets via `--load_model`,
        `ofdmreceiver_np.py:197-203`).

        `ckpt_dir` enables crash-resumable training: a full resume payload
        (state + PRNG key + epoch/best cursors + batch size) is written to
        `<ckpt_dir>/resume` every `ckpt_every` epochs and picked up
        automatically by the next `fit` with the same `ckpt_dir` — the
        trajectory after resume is bit-identical to an uninterrupted run.
        The reference saves its best checkpoint every epoch
        (`ofdmreceiver_np.py:268-272`); epochs here are ~100x shorter
        wall-clock, so an every-epoch write would dominate the loop —
        `ckpt_every` bounds the loss window instead."""
        import numpy as np
        tc = self.tc
        seed = tc.seed if seed is None else seed
        max_epochs = tc.max_epoch_num if max_epochs is None else max_epochs
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        state = self.init_state(k0) if init_state is None else init_state
        state, key, start_epoch, best_loss, best_epoch, best_params, res = \
            self._maybe_resume(ckpt_dir, state, key)
        if res:
            log_fn(f"resumed from {ckpt_dir}/resume at epoch {start_epoch}")
        history = []
        for epoch in range(start_epoch, max_epochs):
            steps_per_epoch = max(1, tc.frames_per_epoch(self.cfg.nsymbol) // self.batch_frames)
            snr = jnp.full((self.batch_frames,), tc.snr, jnp.float32)
            losses = []
            last_ber = 0.5
            # best-model selection metric: 'ce' (default; the optimized
            # objective) or 'total' (reference parity — best by total cost
            # incl. the log-BER metric term, `ofdmreceiver_np.py:268-272`)
            sel = "total_loss" if tc.best_metric == "total" else "ce"
            for _ in range(steps_per_epoch):
                key, k = jax.random.split(key)
                state, aux = self.train_step(state, k, snr)
                losses.append(aux[sel])
            last_ber = float(aux["ber"])
            epoch_loss = float(jnp.mean(jnp.stack(losses)))
            key, k = jax.random.split(key)
            val = self.eval_step(state.params, k, 1024,
                                 jnp.full((1024,), tc.snr, jnp.float32))
            if grow_batch:
                self.batch_frames = self._ideal_batch_frames(last_ber)
            if dump_constellations:
                from dl_ofdm_tpu.utils.observability import dump_constellation
                dump_constellation(tc.token, val["iq_tx"], val["iq_rx"],
                                   out_dir=tc.save_dir)
            history.append({"epoch": epoch, "train_loss": epoch_loss,
                            "val_ber": float(val["ber"]),
                            "val_loss": float(val["ce"])})
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
