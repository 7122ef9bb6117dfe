"""Real FFT transforms with TPU-friendly backends.

The reference leans on cuFFT C2C (reference src/conv.cu:181-194,367,405-408).
TPUs have no FFT unit — XLA lowers jnp.fft to a generic decomposition — so
this module offers two interchangeable backends behind one static-shape API:

  - ``fft``:    jnp.fft.rfft/irfft (XLA's FFT). Best for large transforms
                (the monolithic parity engine's 128K-point FFTs).
  - ``matmul``: DFT-as-matmul against precomputed cos/sin twiddle matrices.
                For the partitioned engine's small-N (e.g. 512) transforms at
                large batch (voices × channels), this maps straight onto the
                MXU systolic array: X = x @ [C | S], x = X_re @ Ci + X_im @ Si.
                ~57× the FLOPs of an FFT at N=512 but FLOPs are the cheap
                resource on TPU; the batched matmul is one fused MXU op with
                perfect layout, no transposes, no strided twiddle passes.

Precision: twiddle matmuls run at HIGH precision (3-pass f32 on the MXU,
~1e-6 relative) — audio requires better than bf16's 8-bit mantissa, and the
extra passes of HIGHEST buy nothing audible.

``backend="auto"`` picks matmul for n ≤ MATMUL_MAX_N, fft otherwise.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MATMUL_MAX_N = 4096
_PREC = jax.lax.Precision.HIGH


@lru_cache(maxsize=16)
def _twiddles_fwd(n: int) -> tuple[np.ndarray, np.ndarray]:
    """[n, n//2+1] cos/-sin matrices: X = x @ (C + jS)."""
    f = n // 2 + 1
    k = np.arange(n, dtype=np.float64)[:, None]
    m = np.arange(f, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * k * m / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=16)
def _twiddles_inv(n: int) -> tuple[np.ndarray, np.ndarray]:
    """[n//2+1, n] inverse matrices folding Hermitian weights and 1/n:
    x = X_re @ Ci + X_im @ Si."""
    f = n // 2 + 1
    m = np.arange(f, dtype=np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * m * k / n
    w = np.full((f, 1), 2.0, dtype=np.float64)
    w[0, 0] = 1.0
    if n % 2 == 0:
        w[-1, 0] = 1.0
    ci = (np.cos(ang) * w / n).astype(np.float32)
    si = (-np.sin(ang) * w / n).astype(np.float32)
    return ci, si


class SpectralTransform:
    """Static-size rfft/irfft over the last axis: [..., n] <-> [..., n//2+1]."""

    def __init__(self, n: int, backend: str = "auto"):
        if n & (n - 1):
            raise ValueError(f"fft size must be a power of two, got {n}")
        if backend == "auto":
            backend = "matmul" if n <= MATMUL_MAX_N else "fft"
        if backend not in ("fft", "matmul"):
            raise ValueError(f"unknown backend {backend!r}")
        self.n = n
        self.num_bins = n // 2 + 1
        self.backend = backend

    def rfft(self, x: jnp.ndarray) -> jnp.ndarray:
        """float32 [..., n] -> complex64 [..., n//2+1]."""
        if self.backend == "fft":
            return jnp.fft.rfft(x, axis=-1)
        c, s = _twiddles_fwd(self.n)
        xf = x.astype(jnp.float32)
        re = jnp.matmul(xf, c, precision=_PREC)
        im = jnp.matmul(xf, s, precision=_PREC)
        return jax.lax.complex(re, im)

    def irfft(self, spec: jnp.ndarray) -> jnp.ndarray:
        """complex64 [..., n//2+1] -> float32 [..., n]."""
        if self.backend == "fft":
            return jnp.fft.irfft(spec, n=self.n, axis=-1)
        ci, si = _twiddles_inv(self.n)
        re = jnp.real(spec)
        im = jnp.imag(spec)
        return (jnp.matmul(re, ci, precision=_PREC)
                + jnp.matmul(im, si, precision=_PREC))

    def __repr__(self):
        return f"SpectralTransform(n={self.n}, backend={self.backend!r})"
