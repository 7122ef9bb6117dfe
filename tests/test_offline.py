"""Time-parallel offline renderer (runtime/offline.py): segment-parallel
bounce == block-streamed serving, engine by engine.

The contract under test: one output block depends only on the trailing
`engine.history_blocks` input blocks at converged params, so priming each
segment's virtual voice with those blocks reproduces the streamed output
(MAC reassociation noise only — the segment's ring pointers sit at
different phases than the stream's)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.engine import IRBank
from tpu_audio.models.reverb import ConvolutionReverb
from tpu_audio.runtime.offline import render_offline


def build_model(engine="fmajor", num_voices=2, block=32, ir_len=300,
                num_irs=3, seed=0, **kwargs):
    rng = np.random.default_rng(seed)
    bank = IRBank()
    for _ in range(num_irs):
        ir = rng.standard_normal((2, ir_len)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    model = ConvolutionReverb(bank, num_voices=num_voices, block=block,
                              engine=engine, max_predelay=64, **kwargs)
    cp = model.control
    cp.wet[:] = 0.8
    cp.dry[:] = 0.3
    cp.level[:] = 0.9
    cp.predelay[:] = [[17, 40]] * num_voices
    cp.pan_wet[:] = [[0.3, -0.4]] * num_voices
    cp.pan_dry[:] = [[-0.2, 0.1]] * num_voices
    for v in range(num_voices):
        cp.select[v] = [v % num_irs, (v + 1) % num_irs]
    return model


def stream_reference(model, x, out_samples):
    """Block-stream the model's own engine at converged params (zero
    blocks appended past the input flush the tail)."""
    eng, bank = model.engine, model.spectra
    b = eng.block
    params = jax.tree.map(jnp.asarray, model.control.snapshot())
    state = eng.init_converged(bank, params)
    step = jax.jit(eng.step_coef_steady
                   if getattr(eng, "variant", None) == "coef" else eng.step)
    blocks = -(-out_samples // b)
    xb = np.zeros((blocks * b, 2), np.float32)
    xb[: x.shape[1]] = x.T
    outs = []
    for t in range(blocks):
        xi = jnp.asarray(np.broadcast_to(
            xb[t * b: (t + 1) * b].T[None], (eng.num_voices, 2, b)))
        state, y = step(state, bank, params, xi)
        outs.append(np.asarray(y))
    out = np.stack(outs)  # [T_b, V, 2, B]
    return out.transpose(1, 2, 0, 3).reshape(eng.num_voices, 2, -1)[
        ..., :out_samples]


def program(t_samples, seed=1):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((2, t_samples)) * 0.1).astype(np.float32)


@pytest.mark.parametrize("engine,kwargs", [
    ("fmajor", {}),
    ("fmajor", {"mac_strategy": "selected"}),
    ("partitioned", {}),
    ("monolithic", {"fft_size": 512}),
])
def test_offline_equals_streamed(engine, kwargs):
    model = build_model(engine=engine, **kwargs)
    x = program(41 * 32 + 7)  # non-block-aligned length
    out = render_offline(model, x, segments=4)
    assert out.shape[0] == 2 and out.shape[1] == 2
    ref = stream_reference(model, x, out.shape[-1])
    np.testing.assert_allclose(out, ref, atol=3e-5)


@pytest.mark.parametrize("strategy", ["allk", "selected"])
def test_offline_cascade_equals_streamed(strategy):
    model = build_model(engine="cascade", block=16, ir_len=400,
                        cascade_ratio=2, mac_strategy=strategy)
    x = program(50 * 16 + 3)
    out = render_offline(model, x, segments=4)
    ref = stream_reference(model, x, out.shape[-1])
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_offline_auto_segments_and_mono():
    model = build_model(num_voices=1)
    x = program(30 * 32)[0]  # mono [T]
    out = render_offline(model, x)  # auto segment count
    ref = stream_reference(model, np.stack([x, x]), out.shape[-1])
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_offline_no_tail_returns_input_length():
    model = build_model(num_voices=1)
    x = program(10 * 32 + 5)
    out = render_offline(model, x, segments=2, include_tail=False)
    assert out.shape == (1, 2, x.shape[1])
    full = render_offline(model, x, segments=2)
    assert full.shape[-1] > x.shape[1]  # the tail rings out
    np.testing.assert_allclose(out, full[..., :x.shape[1]], atol=1e-6)


def test_offline_model_method_and_voice_sum():
    model = build_model(num_voices=2)
    x = program(20 * 32)
    out = model.render_offline(x, segments=2)
    assert out.shape[0] == 2
    # voices are independent: rendering each voice's params alone matches
    solo = build_model(num_voices=1)
    solo.control.select[0] = model.control.select[0]
    solo.control.predelay[0] = model.control.predelay[0]
    np.testing.assert_allclose(out[0], solo.render_offline(
        x, segments=2)[0], atol=3e-5)


def test_offline_rejects_working_set_and_bad_segments():
    model = build_model(engine="fmajor", num_irs=6, bank_capacity=3)
    with pytest.raises(ValueError, match="working-set"):
        render_offline(model, program(64), segments=2)
    with pytest.raises(ValueError, match="segments"):
        render_offline(build_model(num_voices=1), program(64), segments=0)
    with pytest.raises(ValueError, match="stereo"):
        render_offline(build_model(num_voices=1),
                       np.zeros((3, 64), np.float32))
