"""Device mesh + sharding layer.

The reference's only parallelism is host-side: a multiprocessing channel pool
(de-facto serial, `dev/py/ofdmreceiver_np_mp.py:191-224`), MATLAB parfor, and
process-level job grids (SURVEY.md P1-P4).  The TPU-native equivalent is a
`jax.sharding.Mesh` with named axes:

  * 'dp' — data parallel over frames (the channel-pool / parfor replacement);
    gradients and BER confusion matrices reduce with psum (inserted by XLA
    from sharding constraints, or explicitly in shard_map eval paths);
  * 'tp' — tensor parallel over the learned-transform filter axis and the
    wide demodulation dense layers (model-parallel option for large nfft).

Sharding is expressed with `NamedSharding` annotations and `jax.jit`
(GSPMD); XLA inserts the all-reduce/all-gather collectives over ICI.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """Create a 2D ('dp', 'tp') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp*tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_batch(mesh: Mesh, batch):
    """Place per-frame-batched arrays with batch axis over 'dp'."""
    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


# Parameter partitioning rules: regex on the param path -> PartitionSpec.
# The learned-DFT weight [K, F] shards its filter axis over 'tp'; the wide
# demodulation/equalizer dense kernels shard their output (or input) axis.
_RULES = (
    (r"fft_like/(wr|wi)$", P(None, "tp")),
    (r"fft_like/(br|bi|b)$", P("tp")),
    (r"Dense_extract/kernel$", P("tp", None)),
    (r"Dense_(interp|block)\d*/kernel$", P(None, "tp")),
    (r"Dense_(interp|block)\d*/bias$", P("tp")),
)


def param_sharding_rules(path: str):
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def shard_params(mesh: Mesh, params):
    """Apply the partitioning rules to a param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    out = []
    for path, leaf in leaves:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = param_sharding_rules(path_str)
        # drop axes that don't divide evenly (tiny layers stay replicated)
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                ok = False
        sharding = NamedSharding(mesh, spec if ok else P())
        out.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, out)
