from dl_ofdm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, param_sharding_rules, shard_params)
