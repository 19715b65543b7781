from dl_ofdm_tpu.train.metrics import (  # noqa: F401
    confusion_matrix, ber_from_confusion, cross_entropy, l2_regularization)
from dl_ofdm_tpu.train.loop import Trainer, TrainState  # noqa: F401
