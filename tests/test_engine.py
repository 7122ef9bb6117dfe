import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import fftconvolve

from tpu_audio.engine import (
    ControlPlane, IRBank, MonolithicConvolution, PartitionedConvolution,
)

RNG = np.random.default_rng(7)


def make_bank(num_irs=3, ir_len=256, seed=0):
    rng = np.random.default_rng(seed)
    bank = IRBank()
    for k in range(num_irs):
        ir = rng.standard_normal((2, ir_len)).astype(np.float32)
        ir *= 0.5 / np.abs(ir).max()
        bank.append(ir)
    return bank


def stream(engine, state, bank, cp, x_blocks, step=None):
    """Host loop: snapshot params, step, advance countdowns."""
    step = step or engine.step
    outs = []
    for x in x_blocks:
        params = jax.tree.map(jnp.asarray, cp.snapshot())
        state, out = step(state, bank, params, jnp.asarray(x))
        cp.end_block()
        outs.append(np.asarray(out))
    return state, np.concatenate(outs, axis=-1)


def blocks(x, b):
    """[V, 2, T] -> list of [V, 2, b]."""
    return [x[..., i:i + b] for i in range(0, x.shape[-1], b)]


def expected_offline(x, ir, wet, pan_wet, level, predelay, dry, pan_dry):
    """Offline reference composition for one voice, constant params.

    out[o] = clamp(sum_i conv(x[i], ir_i[o]) * wet * panw_i[o] * lvl_i, +-1)
             + sum_i x[i] * dry_i * pand_i[o] * lvl_i, with wet delayed."""
    t = x.shape[-1]
    out = np.zeros((2, t), np.float64)
    for o in range(2):
        acc = np.zeros(t, np.float64)
        for i in range(2):
            pw = (1 - pan_wet[i]) if (pan_wet[i] >= 0 and o == 0) else \
                 (1 + pan_wet[i]) if (pan_wet[i] <= 0 and o == 1) else \
                 1.0 if (o == 0) == (pan_wet[i] < 0) else \
                 (1 - pan_wet[i] if o == 0 else 1 + pan_wet[i])
            gl = 1 - pan_wet[i] if pan_wet[i] >= 0 else 1.0
            gr = 1 + pan_wet[i] if pan_wet[i] <= 0 else 1.0
            g = (gl if o == 0 else gr) * level[i]
            conv = fftconvolve(x[i], ir[i][o])[:t]
            delayed = np.zeros(t)
            delayed[predelay:] = conv[: t - predelay] if predelay else conv[:t]
            if predelay == 0:
                delayed = conv
            acc += delayed * wet[i] * g
        out[o] = np.clip(acc, -1, 1)
        for i in range(2):
            gl = 1 - pan_dry[i] if pan_dry[i] >= 0 else 1.0
            gr = 1 + pan_dry[i] if pan_dry[i] <= 0 else 1.0
            out[o] += x[i] * dry[i] * (gl if o == 0 else gr) * level[i]
    return out.astype(np.float32)


# ------------------------------------------------------------- golden: monolithic

def test_monolithic_matches_offline_convolution():
    """Block-streamed monolithic engine == offline fftconvolve composition
    (SURVEY.md §4 golden requirement)."""
    v, b, n = 2, 64, 1024
    bank = make_bank(num_irs=2, ir_len=300)
    eng = MonolithicConvolution(v, fft_size=n, block=b, max_predelay=256)
    spectra = jnp.asarray(bank.monolithic_spectra(n, reserve=320))
    cp = ControlPlane(v, len(bank), max_predelay=256)
    cp.select[:] = [[0, 0], [1, 1]]
    cp.predelay[:] = 128
    cp.dry[:] = 0.3
    cp.wet[:] = 0.8
    cp.pan_wet[:] = [[-0.5, 0.25], [0.0, 0.0]]
    cp.pan_dry[:] = [[0.1, -0.1], [0.0, 0.0]]
    cp.level[:] = 0.9

    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = eng.init_converged(spectra, params)

    x = (RNG.standard_normal((v, 2, b * 12)) * 0.05).astype(np.float32)
    _, got = stream(eng, state, spectra, cp, blocks(x, b))

    for voice in range(v):
        ir = [bank.ir(int(cp.select[voice, i]))[:, :320] for i in range(2)]
        want = expected_offline(
            x[voice], ir, wet=cp.wet[voice], pan_wet=cp.pan_wet[voice],
            level=cp.level[voice], predelay=128, dry=cp.dry[voice],
            pan_dry=cp.pan_dry[voice])
        np.testing.assert_allclose(got[voice], want, atol=2e-4)


# ------------------------------------------------------------- golden: partitioned

@pytest.mark.parametrize("variant", ["materialized", "coef"])
def test_partitioned_matches_offline_convolution(variant):
    v, b = 1, 64
    ir_len = 500  # not a multiple of b: exercises partition zero-padding
    bank = make_bank(num_irs=2, ir_len=ir_len, seed=3)
    p = bank.max_partitions(b)
    eng = PartitionedConvolution(v, block=b, partitions=p, max_predelay=256,
                                 variant=variant)
    spectra = jnp.asarray(bank.partitioned_spectra(b))
    cp = ControlPlane(v, len(bank), max_predelay=256)
    cp.select[:] = 1
    cp.predelay[:] = 100
    cp.dry[:] = 0.25
    cp.wet[:] = 0.7
    cp.level[:] = 0.8

    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = eng.init_converged(spectra, params)
    x = (RNG.standard_normal((v, 2, b * 16)) * 0.05).astype(np.float32)
    _, got = stream(eng, state, spectra, cp, blocks(x, b))

    ir = [bank.ir(1), bank.ir(1)]
    want = expected_offline(x[0], ir, wet=cp.wet[0], pan_wet=cp.pan_wet[0],
                            level=cp.level[0], predelay=100, dry=cp.dry[0],
                            pan_dry=cp.pan_dry[0])
    np.testing.assert_allclose(got[0], want, atol=2e-4)


def test_partitioned_supports_ir_beyond_monolithic_cap():
    """4s-equivalent test (scaled down): IR much longer than any single FFT
    the block path uses — the whole point of partitioning."""
    v, b = 1, 32
    ir_len = 2048  # 64 partitions of 32
    bank = make_bank(num_irs=1, ir_len=ir_len, seed=5)
    p = bank.max_partitions(b)
    assert p == 64
    eng = PartitionedConvolution(v, block=b, partitions=p, max_predelay=64)
    spectra = jnp.asarray(bank.partitioned_spectra(b))
    cp = ControlPlane(v, 1, max_predelay=64)
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = eng.init_converged(spectra, params)
    x = (RNG.standard_normal((v, 2, b * 80)) * 0.02).astype(np.float32)
    _, got = stream(eng, state, spectra, cp, blocks(x, b))
    ir = [bank.ir(0), bank.ir(0)]
    want = expected_offline(x[0], ir, wet=[1, 1], pan_wet=[0, 0],
                            level=[1, 1], predelay=0, dry=[0, 0], pan_dry=[0, 0])
    np.testing.assert_allclose(got[0], want, atol=3e-4)


# ------------------------------------------------------------- engine equivalence

def run_crossfade_scenario(engine_step, init_state, bank, x, b=64,
                           on_block=None):
    v = x.shape[0]
    cp = ControlPlane(v, 3, max_predelay=128)
    cp.speed[:] = 8
    cp.wet[:] = 0.6
    cp.dry[:] = 0.2
    cp.predelay[:] = 32
    state = init_state
    outs = []
    for t, xb in enumerate(blocks(x, b)):
        if on_block:
            state = on_block(t, cp, state)
        params = jax.tree.map(jnp.asarray, cp.snapshot())
        state, out = engine_step(state, bank, params, jnp.asarray(xb))
        cp.end_block()
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=-1)


def test_monolithic_equals_partitioned_with_crossfade():
    """Cross-engine behaviour through a live IR re-select:

    - the two partitioned variants (materialized slew vs affine-coef) are
      numerically identical at ALL times, including mid-fade;
    - the monolithic engine matches them exactly while the IR is settled
      (before the fade and after convergence); mid-fade it differs by design
      (input-synchronous vs output-synchronous time-varying convolution —
      see engine/partitioned.py docstring), but must stay bounded and
      converge to the same steady state."""
    v, b = 2, 64
    ir_len = 256
    bank = make_bank(num_irs=3, ir_len=ir_len, seed=11)
    p = bank.max_partitions(b)

    mono = MonolithicConvolution(v, fft_size=1024, block=b, max_predelay=128)
    mono_bank = jnp.asarray(bank.monolithic_spectra(1024, reserve=1024 - ir_len))
    part_m = PartitionedConvolution(v, b, p, max_predelay=128, variant="materialized")
    part_c = PartitionedConvolution(v, b, p, max_predelay=128, variant="coef")
    part_bank = jnp.asarray(bank.partitioned_spectra(b))

    def select_events(engine=None, coef=False):
        def on_block(t, cp, state):
            if t == 50:
                old = cp.select.copy()
                cp.set_select(0, 0, 2)
                cp.set_select(0, 1, 2)
                cp.set_select(1, 0, 1)
                if coef:
                    changed = jnp.asarray(cp.select != old)
                    state = engine.collapse(state, part_bank,
                                            jnp.asarray(old), changed)
            if t == 60:  # wet change mid-crossfade
                cp.wet[:] = 0.9
            return state
        return on_block

    n_blocks = 140
    x = (RNG.standard_normal((v, 2, b * n_blocks)) * 0.05).astype(np.float32)
    out_mono = run_crossfade_scenario(
        mono.step, mono.init_state(), mono_bank, x, b,
        on_block=select_events())
    out_pm = run_crossfade_scenario(
        part_m.step, part_m.init_state(), part_bank, x, b,
        on_block=select_events())
    out_pc = run_crossfade_scenario(
        part_c.step, part_c.init_state(), part_bank, x, b,
        on_block=select_events(engine=part_c, coef=True))

    # partitioned variants: identical everywhere, fades included
    np.testing.assert_allclose(out_pc, out_pm, atol=5e-4)
    assert np.abs(out_pm).max() > 1e-3  # non-degenerate

    # monolithic == partitioned once the initial fade-in from zero has
    # settled ((4/5)^45 ~ 4e-5) and before the t=50 re-select perturbs them
    # differently...
    pre = slice(45 * b, 50 * b)
    np.testing.assert_allclose(out_pm[..., pre], out_mono[..., pre], atol=2e-3)
    # ...and again after the crossfade + wet change have fully converged
    # (IR tail is 4 blocks; slew decays ~(4/5)^t after vsteps hits 0)
    tail = slice(-4 * b, None)
    np.testing.assert_allclose(out_pm[..., tail], out_mono[..., tail], atol=2e-3)
    # bounded mid-fade
    assert np.isfinite(out_mono).all() and np.isfinite(out_pm).all()


def test_coef_steady_state_step_matches_full_step():
    """Once coef_a has decayed to ~0, the steady-state step (no base term)
    must be numerically indistinguishable."""
    v, b = 1, 64
    bank = make_bank(num_irs=2, ir_len=128, seed=13)
    p = bank.max_partitions(b)
    eng = PartitionedConvolution(v, b, p, max_predelay=64, variant="coef")
    spectra = jnp.asarray(bank.partitioned_spectra(b))
    cp = ControlPlane(v, 2, max_predelay=64)
    cp.wet[:] = 0.5
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = eng.init_converged(spectra, params)  # coef_a == 0 exactly
    x = (RNG.standard_normal((v, 2, b)) * 0.1).astype(np.float32)
    _, out_full = eng.step_coef(state, spectra, params, jnp.asarray(x))
    _, out_steady = eng.step_coef_steady(state, spectra, params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_steady),
                               atol=1e-7)


def test_crossfade_converges_to_new_ir():
    """After a re-select, output converges to the new IR's convolution."""
    v, b = 1, 32
    bank = make_bank(num_irs=2, ir_len=64, seed=17)
    p = bank.max_partitions(b)
    eng = PartitionedConvolution(v, b, p, max_predelay=32, variant="coef")
    spectra = jnp.asarray(bank.partitioned_spectra(b))
    cp = ControlPlane(v, 2, max_predelay=32)
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    cp.speed[:] = 4
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = eng.init_converged(spectra, params)

    old = cp.select.copy()
    cp.set_select(0, 0, 1)
    cp.set_select(0, 1, 1)
    state = eng.collapse(state, spectra, jnp.asarray(old),
                         jnp.asarray(cp.select != old))

    # run long enough for (1-r)^t to vanish
    x = (RNG.standard_normal((v, 2, b * 120)) * 0.05).astype(np.float32)
    _, got = stream(eng, state, spectra, cp, blocks(x, b))

    # tail blocks must match pure convolution with IR 1
    ir = [bank.ir(1), bank.ir(1)]
    want = expected_offline(x[0], ir, wet=[1, 1], pan_wet=[0, 0], level=[1, 1],
                            predelay=0, dry=[0, 0], pan_dry=[0, 0])
    tail = slice(-b * 4, None)
    np.testing.assert_allclose(got[0][..., tail], want[..., tail], atol=1e-3)


# ------------------------------------------------------------- control plane

def test_cc_scalings_match_reference():
    """CC value scalings from src/conv.cu:255-276."""
    cp = ControlPlane(1, bank_size=152)
    from tpu_audio.engine.params import CCMapping
    m = CCMapping(message=176, select=21, predelay=22, dry=23, wet=24,
                  speed=25, pan_dry=26, pan_wet=27, level=28)
    cp.set_mapping(0, 0, m)
    cp.apply_cc(0, 0, 176, 21, 64)
    assert cp.select[0, 0] == 64 * 152 // 128
    assert cp.vsteps[0, 0] == cp.speed[0, 0]
    cp.apply_cc(0, 0, 176, 22, 127)
    assert cp.predelay[0, 0] == 127 * 8192 // 128
    cp.apply_cc(0, 0, 176, 23, 64)
    assert cp.dry[0, 0] == pytest.approx(0.5)
    cp.apply_cc(0, 0, 176, 24, 127)
    assert cp.wet[0, 0] == pytest.approx(127 / 128)
    cp.apply_cc(0, 0, 176, 26, 0)
    assert cp.pan_dry[0, 0] == pytest.approx(-1.0)
    cp.apply_cc(0, 0, 176, 27, 127)
    assert cp.pan_wet[0, 0] == pytest.approx(127 / 64 - 1)
    cp.apply_cc(0, 0, 176, 28, 96)
    assert cp.level[0, 0] == pytest.approx(0.75)
    cp.apply_cc(0, 0, 176, 25, 127)
    assert cp.speed[0, 0] == 127 * 1024 // 128
    # speed reduction clamps an in-flight countdown (conv.cu:272-274)
    cp.vsteps[0, 0] = 1000
    cp.apply_cc(0, 0, 176, 25, 1)
    assert cp.speed[0, 0] == 1024 // 128
    assert cp.vsteps[0, 0] == cp.speed[0, 0]
    # wrong message byte ignored
    assert not cp.apply_cc(0, 0, 177, 23, 1)


def test_midi_message_dispatch_by_device():
    from tpu_audio.engine.params import CCMapping
    cp = ControlPlane(2, bank_size=4)
    cp.set_mapping(0, 0, CCMapping(device="hw:2,0", message=176, dry=23))
    cp.set_mapping(1, 0, CCMapping(device="hw:3,0", message=176, dry=23))
    cp.apply_midi_message(bytes([176, 23, 64]), device="hw:2,0")
    assert cp.dry[0, 0] == pytest.approx(0.5)
    assert cp.dry[1, 0] == pytest.approx(0.5, abs=0.01) or cp.dry[1, 0] == pytest.approx(0.5)


def test_end_block_counts_down():
    cp = ControlPlane(1, 2)
    cp.vsteps[:] = 2
    cp.end_block()
    assert cp.vsteps[0, 0] == 1
    cp.end_block()
    cp.end_block()
    assert cp.vsteps[0, 0] == 0


# ------------------------------------------------------------- bank

def test_bank_from_reference_index(tmp_path):
    import os
    if not os.path.exists("/root/reference/ir/venues.index"):
        pytest.skip("reference not mounted")
    bank = IRBank.from_index("/root/reference/ir/venues.index", verbose=False)
    assert len(bank) == 5
    spectra = bank.partitioned_spectra(256)
    assert spectra.shape[0] == 5
    assert spectra.shape[1] == 2
    assert spectra.shape[3] == 257
    # cache roundtrip
    c1 = bank.cached_partitioned_spectra(256, tmp_path)
    c2 = bank.cached_partitioned_spectra(256, tmp_path)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(c1, spectra)


def test_bank_prepare_replaces_slot():
    bank = make_bank(num_irs=2, ir_len=100)
    new_ir = np.ones((2, 50), np.float32) * 0.1
    bank.prepare(0, new_ir)
    assert bank.ir(0).shape == (2, 50)
    assert len(bank) == 2
    bank.prepare(5, new_ir)  # extend with gap
    assert len(bank) == 6


def test_bank_resamples_mismatched_rates(tmp_path):
    from tpu_audio.io.wav import WavFile
    rng = np.random.default_rng(30)
    frames = rng.uniform(-0.3, 0.3, (22050, 2)).astype(np.float32)  # 0.5s @ 44.1k... at 22050 it's 1s
    wav = WavFile(path="x", sample_rate=22050, frames=frames)
    bank = IRBank(sample_rate=44100)
    bank.append(wav)
    # 1 second at 22050 Hz -> ~44100 frames at bank rate
    assert abs(bank.ir(0).shape[1] - 44100) <= 2


def test_bank_normalize():
    bank = IRBank()
    rng = np.random.default_rng(50)
    bank.append(rng.standard_normal((2, 100)).astype(np.float32) * 0.01)
    bank.append(rng.standard_normal((2, 200)).astype(np.float32) * 0.8)
    bank.normalize(mode="energy", target=0.1)
    for i in range(2):
        rms = np.sqrt(np.mean(bank.ir(i) ** 2))
        assert abs(rms - 0.1) < 1e-4
    bank.normalize(mode="peak", target=0.5)
    for i in range(2):
        assert abs(np.abs(bank.ir(i)).max() - 0.5) < 1e-4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bank.normalize(mode="loud")


def test_bank_spectral_taper():
    """Reference f_lowpass semantics (src/conv.cu:76-87): spectrum scaled by
    cbrt(0.54 - 0.46 cos(2 pi f / N))."""
    bank = IRBank()
    rng = np.random.default_rng(60)
    ir = rng.standard_normal((2, 256)).astype(np.float32) * 0.2
    bank.append(ir.copy())
    # fft_size == IR length: circular filtering with no truncation -> exact
    bank.spectral_taper(fft_size=256)
    got_spec = np.fft.rfft(bank.ir(0), n=256, axis=-1)
    want = np.fft.rfft(ir, n=256, axis=-1) * np.cbrt(
        0.54 - 0.46 * np.cos(2 * np.pi * np.arange(129) / 256))
    np.testing.assert_allclose(got_spec, want, atol=1e-4)
    # DC is attenuated toward cbrt(0.08) ~ 0.43
    assert np.abs(got_spec[:, 0]).sum() < np.abs(np.fft.rfft(ir, n=256, axis=-1)[:, 0]).sum()
