"""Checkpoint I/O (Orbax) — replaces TF1 Saver (`dev/py/model.py:26-72`).

Checkpoints store {params, opt_state, step} plus metadata (config token).
Naming schema mirrors the reference
(`<token>_<n>mod_snr<s>_cp<b>[_Equalizer<opt>_<chan>]`,
`dev/py/run_local_ofdm.py:77,104`).

`save_resume`/`restore_resume` extend this to full mid-run resumability
(SURVEY §5.4: "params + optimizer state + PRNG key + sweep cursor"): the
payload additionally carries the epoch-loop PRNG key, the epoch cursor,
best-loss tracking and the (adaptively grown) batch size, so a killed
multi-thousand-epoch fit restarts bit-exactly from the last saved epoch —
the TPU-native equivalent of the reference's save-best-every-epoch +
`--load_model` flow (`dev/py/ofdmreceiver_np.py:197-203,268-274`).
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


# -- portable single-file param archives (committed claim-table arms) --------
#
# Orbax checkpoint dirs in `runs/<token>/` are gitignored and cleaned at
# round boundaries (CLAUDE.md); the npz archive is the durable, committable
# form of a trained arm: float32 params only (no optimizer state), one file,
# loadable with zero framework state.  Replaces nothing in the reference —
# the analogous artifact there is the TF1 `.meta/.index/.data` triplet
# committed under `test_v1/model/` (`test_v1/test_ofdm_cdnn_awgn.py:64-85`).


def export_params_npz(path: str, params: Any) -> str:
    """Write a (possibly nested) param dict to a single .npz file.

    Keys are '/'-joined dict paths (scope names contain no '/'); values are
    cast to float32 for size (training dtype is float32 anyway)."""
    flat = {}

    def _walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(jax.device_get(node), np.float32)

    _walk("", params)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)
    return path


def load_params_npz(path: str) -> dict:
    """Inverse of `export_params_npz`: nested dict of float32 numpy arrays."""
    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return out


# -- full-resume payloads (params + opt state + PRNG key + cursor) -----------

_SIG_LEN = 40   # sha1 hexdigest length — fixed so the payload shape is static


def _sig_to_array(sig: str | None) -> np.ndarray:
    buf = (sig or "").encode()[:_SIG_LEN].ljust(_SIG_LEN, b"\0")
    return np.frombuffer(buf, dtype=np.uint8).copy()


def _sig_from_array(arr) -> str | None:
    s = bytes(np.asarray(arr, dtype=np.uint8)).rstrip(b"\0").decode()
    return s or None


def _resume_payload(state, key, epoch, best_loss, best_epoch, best_params,
                    batch_frames, config_sig=None):
    return {
        "state": state,
        "key": np.asarray(key),
        "best_params": best_params,
        # config signature lives INSIDE the payload so it is atomic with the
        # checkpoint write (ADVICE r3: a crash between payload and sidecar
        # writes left a new payload with no sig, which resume then silently
        # accepted under a changed configuration)
        "config_sig": _sig_to_array(config_sig),
        "cursor": {
            "epoch": np.int64(epoch),
            "best_epoch": np.int64(best_epoch),
            "best_loss": np.float64(best_loss),
            "batch_frames": np.int64(batch_frames),
        },
    }


def save_resume(path: str, *, state: Any, key: jax.Array, epoch: int,
                best_loss: float, best_epoch: int, best_params: Any,
                batch_frames: int, config_sig: str | None = None) -> str:
    """Write a full mid-run resume checkpoint (atomic via Orbax).

    `config_sig` (a hash of the run configuration) is stored inside the
    payload (atomic with it) so a later `fit` with DIFFERENT hyperparameters
    refuses to silently warm-start from the stale trajectory (round-2
    VERDICT weak item 6; made atomic per round-3 ADVICE).  A sidecar copy is
    kept for quick external inspection, written atomically via os.replace."""
    out = save(path, _resume_payload(state, key, epoch, best_loss,
                                     best_epoch, best_params, batch_frames,
                                     config_sig))
    if config_sig is not None:
        sig_path = os.path.abspath(path) + ".sig"
        tmp = sig_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(config_sig)
        os.replace(tmp, sig_path)
    return out


def has_resume(path: str) -> bool:
    path = os.path.abspath(path)
    return os.path.isdir(path) and bool(os.listdir(path))


def resume_sig(path: str) -> str | None:
    """Config signature recorded beside a resume payload (None for payloads
    written before signatures existed)."""
    sig_path = os.path.abspath(path) + ".sig"
    if not os.path.isfile(sig_path):
        return None
    with open(sig_path) as f:
        return f.read().strip()


def restore_resume(path: str, state_target: Any, key_like: jax.Array) -> dict:
    """Restore a `save_resume` payload; `state_target`/`key_like` provide the
    pytree structure (an `init_state()` result and any PRNG key).

    The returned dict carries `config_sig` (str | None) decoded from the
    payload-embedded signature; legacy payloads written before the embedded
    sig existed restore with the sidecar value (or None)."""
    target = _resume_payload(state_target, key_like, 0, np.inf, 0,
                             state_target.params, 1)
    try:
        payload = restore(path, target)
        payload["config_sig"] = _sig_from_array(payload["config_sig"])
    except Exception:
        # legacy payload without the embedded sig field: restore with the
        # pre-round-4 structure and fall back to the sidecar
        del target["config_sig"]
        payload = restore(path, target)
        payload["config_sig"] = resume_sig(path)
    return payload
