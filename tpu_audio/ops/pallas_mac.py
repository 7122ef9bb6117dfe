"""Pallas TPU kernel: fused partition-MAC + delay-line shift.

The partitioned engine's hot loop is HBM-bandwidth-bound: per block it must
(1) shift the frequency-domain delay line by one partition and (2) compute,
for every frequency bin f, the complex product-sum of the delay line with
every bank IR's partition spectra:

    m[f, vi, (k,o)] = sum_p X[f, vi, t-p] * H_k[o, p, f]

In XLA this costs two HBM passes over the delay line (roll read+write) plus
an unfused matmul read (~3.7 ms/block at the 64-voice/4s flagship point).
This kernel fuses both into ONE pass: each grid step streams a tile of the
OLD delay line from HBM, writes the shifted tile (new spectrum into
partition 0) and feeds the same tile to the MXU against the bank rhs —
~0.5 ms/block, within ~2x of the pure-bandwidth floor.

Layouts (plane-major, all float32 — complex never materializes):
    fdl   [F, 2, VI, P]   re-plane / im-plane of the delay line
    x_new [F, 2, VI, 1]   the incoming block spectrum
    rhs   [F, 2, P, KOD]  bank as real 2x2 complex-mult blocks, where row
                          plane c=0 carries (br, bi) columns and c=1 carries
                          (-bi, br), so summing the two plane-dots yields the
                          complex product; KOD = K*O*2 output columns
    m     [F, VI, KOD]    MAC result (re/im column pairs per (k, o))

The shift pairs OLD slot p with rhs row p+1 and x_new with rhs row 0, i.e.
the rhs passed per block is time-invariant — no per-block bank rotation.

Grid: one dimension over frequency tiles; the partition axis stays whole
inside the kernel (P up to ~2048 fits VMEM comfortably at small f tiles).

Status (re-measured 2026-08-16 on the current driver stack, TPU v5e via
tunnel, 64v/4s shapes): NO-GO as the default MAC. Isolated at identical
layouts, pallas ring_mac = 7.6 ms vs the XLA window+matmul = 6.5 ms
(Mosaic DMA still trails XLA fusions on this transport), and the production
engine's merged-axis XLA MAC inside the full steady step runs the whole
block in 0.82 ms. f_tile=4 additionally crashes the remote tpu_compile
helper (HTTP 500). The kernels stay exactness-tested (tests/
test_pallas_mac.py, interpret mode) for hardware where Mosaic DMA reaches
parity; revisit if the deployment stack changes.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mac_shift_kernel(fdl_ref, x_ref, rhs_ref, fdl_out_ref, m_ref):
    fdl = fdl_ref[...]          # [ft, 2, VI, P]
    x = x_ref[...]              # [ft, 2, VI, 1]
    # shifted delay line: new spectrum into partition 0, old slots move +1
    shifted = jnp.concatenate([x, fdl[..., :-1]], axis=-1)
    fdl_out_ref[...] = shifted
    # MAC on the SHIFTED line against natural-order rhs:
    # m = sum_c dot(shifted[:, c], rhs[:, c])   (batched over f tile;
    # Mosaic's matmul allows one batch dim, so the two c-planes are two dots)
    rhs = rhs_ref[...]          # [ft, 2, P, KOD]
    dn = (((2,), (1,)), ((0,), (0,)))
    m0 = jax.lax.dot_general(shifted[:, 0], rhs[:, 0], dimension_numbers=dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    m1 = jax.lax.dot_general(shifted[:, 1], rhs[:, 1], dimension_numbers=dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    m_ref[...] = m0 + m1


@partial(jax.jit, static_argnames=("f_tile", "interpret"), donate_argnums=(0,))
def mac_shift(fdl, x_new, rhs, f_tile: int = 2, interpret: bool = False):
    """One fused block update.

    fdl [F, 2, VI, P] (donated), x_new [F, 2, VI, 1], rhs [F, 2, P, KOD]
    -> (fdl_shifted [F, 2, VI, P], m [F, VI, KOD])
    """
    f, _, vi, p = fdl.shape
    kod = rhs.shape[-1]
    grid = (pl.cdiv(f, f_tile),)
    fdl_spec = pl.BlockSpec((f_tile, 2, vi, p), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mac_shift_kernel,
        grid=grid,
        in_specs=[
            fdl_spec,
            pl.BlockSpec((f_tile, 2, vi, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, 2, p, kod), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            fdl_spec,
            pl.BlockSpec((f_tile, vi, kod), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(fdl.shape, jnp.float32),
            jax.ShapeDtypeStruct((f, vi, kod), jnp.float32),
        ],
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * f * 2 * vi * p * kod,
            bytes_accessed=2 * fdl.size * 4 + rhs.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fdl, x_new, rhs)


def mac_shift_reference(fdl, x_new, rhs):
    """Pure-jnp reference of mac_shift (for exactness tests)."""
    shifted = jnp.concatenate([x_new, fdl[..., :-1]], axis=-1)
    m = jnp.einsum("fcvp,fcpk->fvk", shifted, rhs,
                   precision=jax.lax.Precision.HIGHEST)
    return shifted, m


# ---------------------------------------------------------------------------
# Ring-pointer MAC: no delay-line shift at all.
#
# The delay line becomes a ring: the host writes each block's new spectrum
# into slot w = t mod P (a 0.26 MB dynamic_update_slice), and the kernel
# pairs slot s with bank partition (w - s) mod P by taking a dynamic window
# of a DOUBLED, time-REVERSED rhs:
#     rhs2[f, c, j, kod] for j in [0, 2P),  rhs2[j] = Hrev[j mod P],
#     Hrev[j] = H[(-j) mod P]
#     window rows [P - w, 2P - w) give Hrev[(s - w) mod P] = H[(w - s) mod P].
# Per-block HBM traffic: ONE read of the delay line + the small rhs window —
# the bandwidth floor for this computation.
#
# The partition count must be padded to a multiple of 8 (sublane tile); the
# extra zero partitions contribute nothing.
# ---------------------------------------------------------------------------


def _ring_mac_kernel(w_ref, fdl_ref, rhs2_ref, m_ref):
    pp = fdl_ref.shape[-1]
    start = pp - w_ref[0]
    dn = (((1,), (0,)), ((), ()))
    ft = fdl_ref.shape[0]
    for i in range(ft):  # static unroll over the f tile
        rhs_c0 = rhs2_ref[i, 0, pl.ds(start, pp), :]
        rhs_c1 = rhs2_ref[i, 1, pl.ds(start, pp), :]
        m0 = jax.lax.dot_general(fdl_ref[i, 0], rhs_c0, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        m1 = jax.lax.dot_general(fdl_ref[i, 1], rhs_c1, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        m_ref[i] = m0 + m1


@partial(jax.jit, static_argnames=("f_tile", "interpret"))
def ring_mac(w, fdl, rhs2, f_tile: int = 2, interpret: bool = False):
    """Ring-pointer MAC. w: int32 scalar slot of the newest spectrum;
    fdl [F, 2, VI, Pp]; rhs2 [F, 2, 2*Pp, KOD] doubled reversed rhs
    -> m [F, VI, KOD]."""
    f, _, vi, pp = fdl.shape
    kod = rhs2.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(f, f_tile),),
        in_specs=[
            pl.BlockSpec((f_tile, 2, vi, pp), lambda i, w: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, 2, 2 * pp, kod), lambda i, w: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f_tile, vi, kod), lambda i, w: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _ring_mac_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, vi, kod), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * f * 2 * vi * pp * kod,
            bytes_accessed=fdl.size * 4 + rhs2.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(w, jnp.int32).reshape(1), fdl, rhs2)


def ring_mac_reference(w, fdl, rhs2):
    """Pure-jnp reference for exactness tests."""
    f, _, vi, pp = fdl.shape
    start = pp - w
    rhs = jax.lax.dynamic_slice_in_dim(rhs2, start, pp, axis=2)
    return jnp.einsum("fcvp,fcpk->fvk", fdl, rhs,
                      precision=jax.lax.Precision.HIGHEST)


def double_reversed_rhs(rhs: np.ndarray) -> np.ndarray:
    """[F, 2, P, KOD] natural-order rhs -> [F, 2, 2P, KOD] doubled reversed:
    out[j] = H[(-j) mod P], tiled twice along the partition axis.

    Delegates to the engine's double_reversed (one source of truth for
    the (-j mod P) gather). Doubling the PACKED tensor is the expensive
    order on large banks (fmajor.double_reversed docstring: ~50x) — fine
    at the test/experiment scales this module serves."""
    from tpu_audio.engine.fmajor import double_reversed
    return double_reversed(np.asarray(rhs), axis=2)


def pad_partitions(arr: np.ndarray, axis: int, multiple: int = 8) -> np.ndarray:
    """Zero-pad the partition axis to a sublane-aligned multiple."""
    p = arr.shape[axis]
    pad = (-p) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


def pack_rhs_planes(spectra: np.ndarray) -> np.ndarray:
    """[K, O, P, F] complex -> [F, 2, P, K*O*2] f32 plane-major MAC rhs.

    Delegates to the engine's pack_mac_rhs (one source of truth for the
    c=1 plane's (-bi, br) complex-product encoding), unpadded."""
    from tpu_audio.engine.fmajor import pack_mac_rhs
    spectra = np.asarray(spectra)
    return pack_mac_rhs(spectra, spectra.shape[2])
