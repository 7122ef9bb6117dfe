"""Boundary and misuse cases across the engine surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import fftconvolve

from tpu_audio.engine import ControlPlane, IRBank
from tpu_audio.engine.fmajor import FMajorPartitionedConvolution
from tpu_audio.ops.fft import SpectralTransform


def make(num_voices=1, block=32, ir_len=100, num_irs=2, **kw):
    rng = np.random.default_rng(0)
    bank = IRBank()
    for _ in range(num_irs):
        ir = rng.standard_normal((2, ir_len)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    eng = FMajorPartitionedConvolution(num_voices, block,
                                       bank.max_partitions(block),
                                       max_predelay=64, **kw)
    return eng, eng.prepare_bank(bank.partitioned_spectra(block)), bank


def run_blocks(eng, bank_d, cp, x):
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = eng.init_converged(bank_d, params)
    outs = []
    b = eng.block
    for t in range(x.shape[-1] // b):
        params = jax.tree.map(jnp.asarray, cp.snapshot())
        state, out = eng.step_coef(state, bank_d, params,
                                   jnp.asarray(x[..., t * b:(t + 1) * b]))
        cp.end_block()
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=-1)


def test_predelay_at_maximum():
    """pd == max_predelay: the wet tail lands exactly at the ring's end."""
    eng, bank_d, bank = make(ir_len=40)
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.predelay[:] = 64
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 2, 32 * 12)) * 0.05).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    ir = bank.ir(0)
    t = x.shape[-1]
    for o in range(2):
        conv = fftconvolve(x[0, 0], ir[o]) + fftconvolve(x[0, 1], ir[o])
        want = np.zeros(t, np.float32)
        want[64:] = conv[: t - 64]
        np.testing.assert_allclose(got[0, o], np.clip(want, -1, 1), atol=2e-4)


def test_predelay_zero():
    eng, bank_d, bank = make(ir_len=40)
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.predelay[:] = 0
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((1, 2, 32 * 8)) * 0.05).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    ir = bank.ir(0)
    t = x.shape[-1]
    want = fftconvolve(x[0, 0], ir[0]) + fftconvolve(x[0, 1], ir[0])
    np.testing.assert_allclose(got[0, 0], np.clip(want[:t], -1, 1), atol=2e-4)


def test_single_ir_single_voice_single_partition():
    """Degenerate geometry: one IR shorter than a block (P=1, padded Pp=8)."""
    eng, bank_d, bank = make(num_irs=1, ir_len=20)
    assert eng.partitions == 1 and eng.pp == 8
    cp = ControlPlane(1, 1, max_predelay=64)
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, 2, 32 * 6)) * 0.1).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    ir = bank.ir(0)
    want = fftconvolve(x[0, 0], ir[0]) + fftconvolve(x[0, 1], ir[0])
    np.testing.assert_allclose(got[0, 0], np.clip(want[: x.shape[-1]], -1, 1),
                               atol=2e-4)


def test_select_clamped_to_bank():
    """Out-of-range select values are clamped by the snapshot (CC select of
    127 maps to bank_size-1 at most, conv.cu:261 semantics)."""
    cp = ControlPlane(1, 2)
    cp.select[:] = 99
    params = cp.snapshot()
    assert params.select.max() == 1
    cp2 = ControlPlane(1, 0)
    cp2.select[:] = 5
    assert cp2.snapshot().select.max() == 0


def test_non_power_of_two_block_rejected():
    with pytest.raises(ValueError, match="power of two"):
        SpectralTransform(2 * 96)
    with pytest.raises(ValueError):
        FMajorPartitionedConvolution(1, 96, 4)


def test_block_128_end_to_end():
    eng, bank_d, bank = make(block=128, ir_len=300)
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((1, 2, 128 * 6)) * 0.05).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    ir = bank.ir(0)
    want = fftconvolve(x[0, 0], ir[0]) + fftconvolve(x[0, 1], ir[0])
    np.testing.assert_allclose(got[0, 0], np.clip(want[: x.shape[-1]], -1, 1),
                               atol=2e-4)


def test_ring_pointer_wraps_many_times():
    """Stream 3x the ring length of blocks: pointer wrap must not corrupt
    history (output equals offline convolution throughout)."""
    eng, bank_d, bank = make(ir_len=64)   # Pp = 8
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    rng = np.random.default_rng(5)
    n_blocks = 3 * eng.pp + 3
    x = (rng.standard_normal((1, 2, 32 * n_blocks)) * 0.05).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    ir = bank.ir(0)
    want = fftconvolve(x[0, 0], ir[0]) + fftconvolve(x[0, 1], ir[0])
    np.testing.assert_allclose(got[0, 0], np.clip(want[: x.shape[-1]], -1, 1),
                               atol=2e-4)


def test_zero_wet_is_pure_dry():
    eng, bank_d, _ = make()
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.wet[:] = 0.0
    cp.dry[:] = 1.0
    rng = np.random.default_rng(6)
    x = (rng.standard_normal((1, 2, 32 * 4)) * 0.1).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    want = x[0, 0] + x[0, 1]
    np.testing.assert_allclose(got[0, 0], want, atol=1e-5)
    np.testing.assert_allclose(got[0, 1], want, atol=1e-5)


def test_level_zero_silences_voice():
    eng, bank_d, _ = make()
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.level[:] = 0.0
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((1, 2, 32 * 4)) * 0.1).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_extreme_pan_hard_left_right():
    eng, bank_d, bank = make(num_irs=1, ir_len=40)
    cp = ControlPlane(1, 1, max_predelay=64)
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    cp.pan_wet[:] = 1.0  # hard right: left gain 0
    rng = np.random.default_rng(8)
    x = (rng.standard_normal((1, 2, 32 * 4)) * 0.1).astype(np.float32)
    got = run_blocks(eng, bank_d, cp, x)
    np.testing.assert_allclose(got[0, 0], 0.0, atol=1e-6)  # L silent
    assert np.abs(got[0, 1]).max() > 1e-3                  # R has wet
