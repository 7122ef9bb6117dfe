"""Host-link wire formats for audio blocks.

The engine computes f32 throughout; on bandwidth-constrained host links
outputs may travel as 16-bit PCM — the DAC-facing format (the reference's
own proven interfaces are 16/24-bit). Single-sourced here so the streaming
session and the benchmark cannot drift apart on the format.
"""

from __future__ import annotations

import numpy as np

PCM16_SCALE = 32767.0


def encode_pcm16(x):
    """f32 [-1, 1] -> int16 (device-side; call under jit).

    Round-to-nearest: half-LSB worst-case quantization error (a bare
    int16 cast truncates toward zero — double the error, and a DC-shaped
    one around zero)."""
    import jax.numpy as jnp

    return jnp.round(jnp.clip(x, -1.0, 1.0) * PCM16_SCALE).astype(jnp.int16)


def decode_pcm16(x: np.ndarray) -> np.ndarray:
    """int16 -> f32 (host-side, after the transfer)."""
    return x.astype(np.float32) / PCM16_SCALE
