"""Click-free IR crossfade / wet-gain smoothing.

Semantics of the reference's f_interpolate kernel (reference src/conv.cu:15-32,
flagged in-source as "one of the most time consuming parts", src/conv.cu:337):
every block, the *active* spectrum slews one step toward the *selected* bank
spectrum scaled by the wet gain:

    active += (bank[select] * wet - active) / (vsteps + 5)

with ``vsteps`` reloaded to ``speed`` on IR select (src/conv.cu:261) and
decremented once per block until 0 (src/conv.cu:345,353). At vsteps == 0 the
smoother keeps converging at rate 1/5 — that permanent 1/5-per-block slew is
also what smooths live `wet` changes.

Because the step factor is identical for every bin, this recursion commutes
with the Fourier transform and with IR partitioning: the slewed *spectra*
trajectory is identical whether applied to the time-domain IR, the
monolithic spectrum, or partition spectra (tests/test_ops.py::
test_slew_commutes_with_partitioning). Engine *output* during a fade still
depends on the convolution structure — see the crossfade-semantics note in
tpu_audio/engine/partitioned.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def slew_spectra(active: jnp.ndarray, target: jnp.ndarray,
                 wet: jnp.ndarray, vsteps: jnp.ndarray) -> jnp.ndarray:
    """One crossfade step. `active`/`target` are complex spectra [..., F];
    `wet` and `vsteps` are scalars or broadcastable leading-dim arrays."""
    wet = jnp.asarray(wet, dtype=jnp.float32)
    step = 1.0 / (jnp.asarray(vsteps, dtype=jnp.float32) + 5.0)
    return active + (target * wet - active) * step


def vsteps_decrement(vsteps: jnp.ndarray) -> jnp.ndarray:
    """vsteps = max(vsteps - 1, 0) (reference src/conv.cu:345,353)."""
    return jnp.maximum(jnp.asarray(vsteps) - 1, 0)
