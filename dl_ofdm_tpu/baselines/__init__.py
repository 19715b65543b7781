from dl_ofdm_tpu.baselines.pdp import rms_delay_spread, mmse_pdp  # noqa: F401
from dl_ofdm_tpu.baselines.estimators import ESTIMATOR_NAMES  # noqa: F401
