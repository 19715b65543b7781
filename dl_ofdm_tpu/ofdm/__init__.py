from dl_ofdm_tpu.ofdm.constellation import (  # noqa: F401
    const_table,
    bits_to_symbols,
    matlab_gray_table,
    demod_nearest,
    bits_from_indices,
    indices_from_bits,
)
from dl_ofdm_tpu.ofdm.plan import SubcarrierPlan, lte_dl_cfg  # noqa: F401
from dl_ofdm_tpu.ofdm.tx import ofdm_modulate_frames, OFDMTx  # noqa: F401
from dl_ofdm_tpu.ofdm.papr import clip_papr, clip_papr_iq  # noqa: F401
