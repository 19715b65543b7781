"""Transfer learning: param-tree surgery + masked optimizer.

JAX-native replacement for the reference's TF1 graph-editor flow
(`dev/py/ofdmreceiver_np_mp.py:264-380`): restore a pretrained AWGN receiver,
splice a fresh equalizer in front of it, train ONLY the equalizer variables
with a re-initialized Adam state.  Here that is:

  1. `graft_pretrained(eq_params, rx_params)` — insert the pretrained
     receiver params under 'receiver' of a freshly-initialized
     EqualizedReceiver tree (the `reroute_inputs` equivalent);
  2. `equalizer_mask(params)` — boolean tree marking 'Equalizer/...' params;
  3. `masked_optimizer(...)` — optax.masked Adam so frozen params receive no
     updates and carry no optimizer state (the `var_list=trainable_vars` +
     fresh-optimizer-init equivalent, `:346-371`).
"""
from __future__ import annotations

from typing import Any

import jax
import optax

from dl_ofdm_tpu.config import TrainConfig
from dl_ofdm_tpu.train.loop import make_optimizer


def graft_pretrained(fresh_params: Any, pretrained_rx_params: Any,
                     rx_scope: str = "receiver") -> Any:
    """Replace `fresh_params[rx_scope]` with the pretrained receiver tree."""
    if rx_scope not in fresh_params:
        raise KeyError(f"{rx_scope!r} not in params: {list(fresh_params)}")
    out = dict(fresh_params)
    out[rx_scope] = pretrained_rx_params
    return out


def scope_mask(params: Any, scope: str = "Equalizer") -> Any:
    """Boolean pytree: True for params under the given top-level scope."""
    return {k: jax.tree.map(lambda _: k == scope, v)
            for k, v in params.items()}


def masked_optimizer(tc: TrainConfig, params: Any,
                     trainable_scope: str = "Equalizer"):
    """Adam over the trainable scope only; frozen params get zero updates."""
    mask = scope_mask(params, trainable_scope)
    return optax.masked(make_optimizer(tc), mask), mask
