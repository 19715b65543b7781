from dl_ofdm_tpu.models.dccn import DCCNReceiver, DNNReceiver, RxOutputs  # noqa: F401
from dl_ofdm_tpu.models.equalizers import Equalizer, EQUALIZER_REGISTRY  # noqa: F401
from dl_ofdm_tpu.models.receiver import EqualizedReceiver  # noqa: F401
