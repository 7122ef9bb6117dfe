"""Exactness coverage for the Pallas TPU MAC kernels (interpret mode on CPU).

These kernels are correct but non-default: on the current tunneled chip
Mosaic DMA streams at ~125 GB/s vs ~210+ GB/s for XLA fusions, so the XLA
path wins end-to-end (measured; see ops/pallas_mac.py and README). The
kernels are kept, TESTED, for hardware where Pallas DMA reaches parity —
this file pins their semantics against the pure-jnp references and against
a from-scratch complex product-sum.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_audio.ops.pallas_mac import (
    double_reversed_rhs, mac_shift, mac_shift_reference, pack_rhs_planes,
    pad_partitions, ring_mac, ring_mac_reference,
)

F, VI, P, K, O = 8, 4, 16, 2, 2
KOD = K * O * 2


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    fdl = rng.standard_normal((F, 2, VI, P)).astype(np.float32)
    x_new = rng.standard_normal((F, 2, VI, 1)).astype(np.float32)
    spectra = (rng.standard_normal((K, O, P, F))
               + 1j * rng.standard_normal((K, O, P, F))).astype(np.complex64)
    rhs = pack_rhs_planes(spectra)
    return fdl, x_new, spectra, rhs


def test_pack_rhs_planes_encodes_complex_product():
    """The plane-major 2x2 packing must make the two plane-dots sum to the
    true complex product-sum (checked against a from-scratch einsum)."""
    fdl, _, spectra, rhs = _inputs()
    xc = fdl[:, 0] + 1j * fdl[:, 1]                      # [F, VI, P] complex
    hc = np.transpose(spectra, (3, 2, 0, 1)).reshape(F, P, KOD // 2)
    _, m = mac_shift_reference(jnp.asarray(fdl), jnp.zeros((F, 2, VI, 1)),
                               jnp.asarray(rhs))
    m = np.asarray(m)
    # the reference applies the shift first; feed x_new=0 and compare
    # against the correspondingly shifted complex line
    xc_shift = np.concatenate([np.zeros((F, VI, 1), np.complex64),
                               xc[..., :-1]], axis=-1)
    want = np.einsum("fvp,fpk->fvk", xc_shift, hc)       # complex [F,VI,K*O]
    np.testing.assert_allclose(m[..., 0::2], want.real, atol=2e-4)
    np.testing.assert_allclose(m[..., 1::2], want.imag, atol=2e-4)


def test_mac_shift_kernel_matches_reference_interpret():
    """Pallas mac_shift (interpret mode) == pure-jnp reference, bit-close,
    including the in-kernel delay-line shift and the input_output_alias."""
    fdl, x_new, _, rhs = _inputs(1)
    want_fdl, want_m = mac_shift_reference(
        jnp.asarray(fdl), jnp.asarray(x_new), jnp.asarray(rhs))
    got_fdl, got_m = mac_shift(jnp.asarray(fdl), jnp.asarray(x_new),
                               jnp.asarray(rhs), f_tile=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_fdl), np.asarray(want_fdl))
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=1e-5)


def test_mac_shift_streams_blocks_like_engine():
    """Streaming T blocks through mac_shift reproduces the partition MAC of
    a from-scratch frequency-domain delay line."""
    rng = np.random.default_rng(2)
    fdl = jnp.zeros((F, 2, VI, P), jnp.float32)
    _, _, spectra, rhs = _inputs(2)
    hc = np.transpose(spectra, (3, 2, 0, 1)).reshape(F, P, KOD // 2)
    line = np.zeros((F, VI, P), np.complex64)
    rhs_d = jnp.asarray(rhs)
    for t in range(6):
        xb = rng.standard_normal((F, 2, VI, 1)).astype(np.float32)
        fdl, m = mac_shift(fdl, jnp.asarray(xb), rhs_d, interpret=True)
        line = np.concatenate([xb[:, 0] + 1j * xb[:, 1], line[..., :-1]],
                              axis=-1)
        want = np.einsum("fvp,fpk->fvk", line, hc)
        np.testing.assert_allclose(np.asarray(m)[..., 0::2], want.real,
                                   atol=3e-4, err_msg=f"block {t}")
        np.testing.assert_allclose(np.asarray(m)[..., 1::2], want.imag,
                                   atol=3e-4, err_msg=f"block {t}")


@pytest.mark.parametrize("w", [0, 1, 7, P - 1])
def test_ring_mac_kernel_matches_reference_interpret(w):
    """Pallas ring_mac (interpret mode, scalar-prefetch dynamic window) ==
    pure-jnp reference for every ring phase."""
    fdl, _, _, rhs = _inputs(3)
    rhs2 = double_reversed_rhs(rhs)
    want = ring_mac_reference(w, jnp.asarray(fdl), jnp.asarray(rhs2))
    got = ring_mac(w, jnp.asarray(fdl), jnp.asarray(rhs2), f_tile=2,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_ring_mac_equals_shift_mac_over_a_stream():
    """Ring addressing (slot w = t mod P, doubled-reversed rhs window) must
    equal the shift formulation block for block."""
    rng = np.random.default_rng(4)
    _, _, _, rhs = _inputs(4)
    rhs2 = jnp.asarray(double_reversed_rhs(rhs))
    rhs_d = jnp.asarray(rhs)
    fdl_shift = jnp.zeros((F, 2, VI, P), jnp.float32)
    fdl_ring = np.zeros((F, 2, VI, P), np.float32)
    w = -1
    for t in range(5):
        xb = rng.standard_normal((F, 2, VI, 1)).astype(np.float32)
        fdl_shift, m_shift = mac_shift(fdl_shift, jnp.asarray(xb), rhs_d,
                                       interpret=True)
        w = (w + 1) % P
        fdl_ring[..., w] = xb[..., 0]
        m_ring = ring_mac(w, jnp.asarray(fdl_ring), rhs2, interpret=True)
        np.testing.assert_allclose(np.asarray(m_ring), np.asarray(m_shift),
                                   atol=1e-5, err_msg=f"block {t}")


def test_pad_partitions_is_inert():
    """Zero partition padding must not change the MAC result."""
    fdl, _, _, rhs = _inputs(5)
    w = 3
    rhs2 = double_reversed_rhs(rhs)
    want = np.asarray(ring_mac_reference(w, jnp.asarray(fdl),
                                         jnp.asarray(rhs2)))
    fdl_p = pad_partitions(fdl, axis=3, multiple=8)
    rhs_p = pad_partitions(rhs, axis=2, multiple=8)
    rhs2_p = double_reversed_rhs(rhs_p)
    got = np.asarray(ring_mac_reference(w, jnp.asarray(fdl_p),
                                        jnp.asarray(rhs2_p)))
    np.testing.assert_allclose(got, want, atol=1e-6)
