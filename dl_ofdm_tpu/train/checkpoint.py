"""Checkpoint I/O (Orbax) — replaces TF1 Saver (`dev/py/model.py:26-72`).

Checkpoints store {params, opt_state, step} plus metadata (config token).
Naming schema mirrors the reference
(`<token>_<n>mod_snr<s>_cp<b>[_Equalizer<opt>_<chan>]`,
`dev/py/run_local_ofdm.py:77,104`).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def token_name(token: str, nbits: int, snr: float, cp: bool,
               opt: int | None = None, channel: str | None = None) -> str:
    name = f"{token}_{nbits}mod_snr{int(snr)}_cp{cp}"
    if channel is not None:
        opt_str = "" if opt is None else str(opt)
        name += f"_Equalizer{opt_str}_{channel}"
    return name


def save(path: str, state: Any) -> str:
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
    else:  # lightweight fallback
        flat, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"),
                 *[np.asarray(x) for x in flat])
    return path


def restore(path: str, target: Any) -> Any:
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=jax.device_get(target))
    flat, treedef = jax.tree_util.tree_flatten(target)
    data = np.load(os.path.join(path, "state.npz"))
    return jax.tree_util.tree_unflatten(
        treedef, [data[k] for k in data.files])
