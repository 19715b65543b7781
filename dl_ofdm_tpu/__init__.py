"""dl_ofdm_tpu — a TPU-native (JAX/XLA/Pallas) framework for learned OFDM receivers.

Re-implements, TPU-first, the capabilities of the Deep-Waveform reference system
(`zhongyuanzhao/dl_ofdm`): an end-to-end simulated OFDM link with a deep
complex-valued convolutional network (DCCN) receiver, 3GPP Rayleigh fading
channels with Jakes Doppler, a classical LS/LMMSE estimator baseline suite,
transfer-learning equalizer training, and BER-vs-SNR evaluation protocols.

Architecture (idiomatic JAX, not a port):
  * the full pipeline bits -> OFDM TX -> fading -> AWGN -> DCCN -> loss is one
    jitted XLA program with on-device data generation (no feed-dict boundary);
  * complex-valued NN layers are expressed as (re, im) real-pair algebra so
    every hot op lowers to MXU matmuls; the reference's "(1,K) complex conv"
    layers are recognized as complex dense matmuls and implemented as such;
  * scale-out is mesh-based (jax.sharding + shard_map) with psum/all_gather
    collectives instead of host multiprocessing pools.

Subpackages:
  ofdm      - constellations, subcarrier plans, OFDM TX, PAPR clip
  channel   - AWGN, 3GPP Rayleigh profiles, fractional-delay FIR, Jakes Doppler
  ops       - complex-valued NN ops (dense/conv, exact + ablation variants)
  models    - DCCN receiver, equalizer zoo, DNN ablations
  baselines - classical channel estimators (LS/LMMSE family, CP-enhanced)
  train     - jitted train/eval loops, transfer learning, checkpoints, metrics
  parallel  - device mesh, sharding specs, distributed BER reduction
  eval      - BER-vs-SNR sweep protocols and result schemas
"""

__version__ = "0.1.0"

from dl_ofdm_tpu.config import OFDMConfig, ChannelConfig, TrainConfig  # noqa: F401
