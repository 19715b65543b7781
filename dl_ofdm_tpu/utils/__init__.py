from dl_ofdm_tpu.utils.observability import (  # noqa: F401
    dump_constellation, Throughput, profile_trace)
