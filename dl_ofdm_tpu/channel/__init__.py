from dl_ofdm_tpu.channel.profiles import TapProfile, get_profile, PROFILE_NAMES  # noqa: F401
from dl_ofdm_tpu.channel.awgn import awgn_channel  # noqa: F401
from dl_ofdm_tpu.channel.rayleigh import RayleighChannel, ChannelOut  # noqa: F401
