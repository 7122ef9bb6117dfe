"""Checkpoint/resume: full parameter + engine-state serialisation.

The reference has none of this (SURVEY.md §5: settings.txt only, and its
Settings::save is ``assert(false)``, reference src/settings.cu:26-29). Here a
checkpoint captures everything needed to resume a live session bit-exactly:
the engine state pytree (delay lines, crossfade state), the control plane
(all live parameter values, countdowns, speeds), and geometry metadata to
validate compatibility on load. Spectra banks are NOT stored — they are
content-addressed derived data (see IRBank.cached_partitioned_spectra).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax

from tpu_audio.engine.params import ControlPlane
from tpu_audio.utils.transfer import device_put_maybe_complex, to_host_maybe_complex

_CP_FIELDS = ("select", "predelay", "vsteps", "speed", "dry", "wet",
              "pan_dry", "pan_wet", "level")


def _npz_safe(arr: np.ndarray) -> np.ndarray:
    """np.savez silently degrades extended dtypes (e.g. ml_dtypes.bfloat16)
    to raw void records that cannot be .astype()d back on load. Store such
    leaves as same-width unsigned-integer views; the recorded dtype name in
    the header restores them bit-exactly."""
    if arr.dtype.kind in "fiubc":
        return arr
    width = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}
    return arr.view(width[arr.dtype.itemsize])


def save_checkpoint(path: str | os.PathLike, state, control: ControlPlane,
                    meta: dict | None = None) -> None:
    """Serialise engine state + control plane to one .npz file."""
    arrays: dict[str, np.ndarray] = {}
    leaves, treedef = jax.tree.flatten(state)
    dtypes = []
    for i, leaf in enumerate(leaves):
        host = to_host_maybe_complex(leaf)
        dtypes.append(str(host.dtype))
        arrays[f"state_{i}"] = _npz_safe(host)
    for name in _CP_FIELDS:
        arrays[f"cp_{name}"] = getattr(control, name)
    # auxiliary runtime state registered on the control plane (e.g. the
    # working set's slot -> IR residency map, without which a restored
    # `select` would point at a slot holding a DIFFERENT IR)
    for name, value in control.aux.items():
        arrays[f"aux_{name}"] = np.asarray(value)
    header = {
        "aux_keys": sorted(control.aux),
        "num_state_leaves": len(leaves),
        "state_dtypes": dtypes,
        "state_class": type(state).__name__,
        "num_voices": control.num_voices,
        "bank_size": control.bank_size,
        "max_predelay": control.max_predelay,
        "meta": meta or {},
    }
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    # atomic replace: a crash mid-save (the exact event checkpoints exist
    # for) must never truncate the previous good checkpoint. Writing
    # through a file object also stops np.savez silently appending '.npz'
    # to bare paths, which would make save/exists/load disagree.
    tmp = f"{os.fspath(path)}.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str | os.PathLike, state_template,
                    control: ControlPlane):
    """Restore (state, control) from a checkpoint.

    state_template: a state pytree with the expected structure/shapes (e.g.
    engine.init_state()); shapes are validated leaf-by-leaf.
    """
    with np.load(path) as data:
        header = json.loads(bytes(data["header"]).decode())
        leaves, treedef = jax.tree.flatten(state_template)
        if header["num_state_leaves"] != len(leaves):
            raise ValueError(
                f"checkpoint has {header['num_state_leaves']} state leaves, "
                f"engine expects {len(leaves)}")
        if header["num_voices"] != control.num_voices:
            raise ValueError(
                f"checkpoint is for {header['num_voices']} voices, "
                f"control plane has {control.num_voices}")
        dtypes = header.get("state_dtypes")
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"state_{i}"]
            saved_dtype = np.dtype(dtypes[i]) if dtypes else np.dtype(leaf.dtype)
            if arr.dtype != saved_dtype:
                # stored as a same-width integer view (or, from older
                # checkpoints, degraded to void) — restore bit-exactly
                arr = arr.view(saved_dtype)
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"state leaf {i}: checkpoint shape {arr.shape} != "
                    f"engine shape {leaf.shape}")
            new_leaves.append(device_put_maybe_complex(arr.astype(leaf.dtype)))
        state = jax.tree.unflatten(treedef, new_leaves)
        for name in _CP_FIELDS:
            getattr(control, name)[...] = data[f"cp_{name}"]
        for name in header.get("aux_keys", ()):
            control.aux[name] = data[f"aux_{name}"]
        if header.get("aux_keys") and control.on_aux_restored is not None:
            control.on_aux_restored()
        return state, header.get("meta", {})
