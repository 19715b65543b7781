from dl_ofdm_tpu.ops.complex_ops import (  # noqa: F401
    ComplexDense,
    ComplexConv2d,
    complex_mul,
    iq_to_complex,
    complex_to_iq,
)
from dl_ofdm_tpu.ops.norms import frame_layer_norm, batch_norm_ref, leaky_relu  # noqa: F401
