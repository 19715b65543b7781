"""Scaling-efficiency harness: train-step throughput vs mesh width.

With one physical chip in this environment, the dp-scaling sweep runs on a
virtual CPU mesh (correctness/collective-overhead shape only; absolute
numbers need a pod slice).  On a pod, run unchanged with JAX_PLATFORMS unset.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/scaling_bench.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()

import jax

# honor an explicit JAX_PLATFORMS=cpu request (this image's sitecustomize
# pins the single-chip axon backend otherwise, and env alone is latched)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from dl_ofdm_tpu.config import OFDMConfig, TrainConfig
from dl_ofdm_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from dl_ofdm_tpu.train.loop import Trainer, TrainState


def bench_width(n_dev: int, frames_per_dev: int = 64, iters: int = 10):
    mesh = make_mesh(jax.devices()[:n_dev], dp=n_dev, tp=1)
    cfg = OFDMConfig(nbits=1)
    tc = TrainConfig(batch_size=7 * frames_per_dev * n_dev)
    tr = Trainer(cfg, tc, channel="ETU")
    key = jax.random.PRNGKey(0)
    state = tr.init_state(key)
    params = shard_params(mesh, state.params)
    state = TrainState(params, tr.optimizer.init(params),
                       jnp.zeros((), jnp.int32))
    state = jax.tree.map(
        lambda x: x if hasattr(x.sharding, "mesh") and x.sharding.mesh == mesh
        else jax.device_put(x, jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), state)
    n_frames = frames_per_dev * n_dev
    snr = jnp.full((n_frames,), 5.0, jnp.float32)
    bits, rx_in, _, _, _ = tr.synthesize(key, n_frames, snr)
    bits, rx_in = shard_batch(mesh, (bits, rx_in))

    def step(state, bits, rx_in):
        (loss, aux), grads = jax.value_and_grad(
            tr._loss_fn, has_aux=True)(state.params, bits, rx_in)
        updates, opt_state = tr.optimizer.update(
            grads, state.opt_state, state.params)
        return TrainState(optax.apply_updates(state.params, updates),
                          opt_state, state.step + 1), loss

    fn = jax.jit(step)

    # d2h-fenced estimator (utils/timing.py): correct on CPU meshes and on
    # the tunneled axon backend, whose block_until_ready does not fence.
    from dl_ofdm_tpu.utils.timing import bench_steps
    box = {"s": state}

    def timed(i):
        box["s"], _ = fn(box["s"], bits, rx_in)
        return box["s"].params

    dt = bench_steps(timed, iters=iters)
    return n_frames * 560 / dt, dt


def main():
    # weak scaling at a production per-device batch (tiny batches measure
    # only the CPU-emulation collective rendezvous, not the sharded program)
    frames_per_dev = int(os.environ.get("SCALING_FRAMES_PER_DEV", "512"))
    results = {}
    base = None
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        thr, dt = bench_width(n, frames_per_dev=frames_per_dev)
        results[n] = thr
        if base is None:
            base = thr
        eff = thr / (base * n)
        line = (f"{n} device(s) x {frames_per_dev} frames: "
                f"{dt*1e3:8.2f} ms/step  {thr:.3e} IQ/s  "
                f"weak-scaling efficiency {eff*100:5.1f}%")
        if jax.default_backend() == "cpu" and n > 1:
            # virtual devices divide one fixed host thread pool, so the
            # compute-bound weak-scaling ceiling is 1/n; efficiency above
            # that ceiling means the sharded program (collectives included)
            # adds no overhead of its own.
            line += f"  (shared-core ceiling {100.0 / n:.1f}%)"
        print(line)
    if jax.default_backend() == "cpu":
        print("NOTE: virtual CPU devices share one host thread pool; the "
              "per-device efficiency ceiling is 1/n regardless of sharding "
              "quality. Efficiency above the ceiling on every width means "
              "collective overhead is negligible; absolute scaling numbers "
              "need a pod slice.")


if __name__ == "__main__":
    main()
