"""Accelerator selection and enumeration.

Capability equivalent of the reference's GPU selection (reference
src/gpu.cu:38-90, ``selectGpu``): enumerate devices, score them, pick the
best, and log a property table. On TPU there is no per-device clock/SM
scoring to do — JAX enumerates the chips of one platform — so the score is
(platform preference, core count) and "selection" means choosing the default
device for single-device paths; multi-device scaling goes through
tpu_audio.parallel instead.
"""

from __future__ import annotations

import jax

from tpu_audio.utils.log import Log

_PLATFORM_PREFERENCE = {"tpu": 3, "axon": 3, "gpu": 2, "cuda": 2, "cpu": 1}


def device_summary(device) -> str:
    bits = [f"platform={device.platform}", f"id={device.id}"]
    for attr in ("device_kind", "process_index"):
        val = getattr(device, attr, None)
        if val is not None:
            bits.append(f"{attr}={val}")
    core = getattr(device, "core_on_chip", None)
    if core is not None:
        bits.append(f"core={core}")
    return " ".join(str(b) for b in bits)


def select_tpu(verbose: bool = True):
    """Return the preferred jax.Device, logging the device table.

    Mirrors the role of selectGpu() (reference src/gpu.cu:38-90): enumerate,
    log properties, return the highest-scoring device.
    """
    devices = jax.devices()
    if verbose:
        Log.info("device", "%d device(s) visible on platform '%s'",
                 len(devices), devices[0].platform if devices else "none")
        for d in devices:
            Log.newline(device_summary(d))
    best = max(
        devices,
        key=lambda d: (_PLATFORM_PREFERENCE.get(d.platform.lower(), 0), -d.id),
    )
    if verbose:
        Log.info("device", "selected: %s", device_summary(best))
    return best
