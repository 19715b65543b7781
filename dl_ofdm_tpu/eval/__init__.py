from dl_ofdm_tpu.eval.sweep import ber_sweep, cross_channel_sweep, SweepResult  # noqa: F401
