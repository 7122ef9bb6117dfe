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
    blocks appended past the input flush the tail). `x` may be shared
    [2, T] or per-voice [V, 2, T]."""
    eng, bank = model.engine, model.spectra
    b, v = eng.block, eng.num_voices
    params = jax.tree.map(jnp.asarray, model.control.snapshot())
    state = eng.init_converged(bank, params)
    step = jax.jit(eng.step_coef_steady
                   if getattr(eng, "variant", None) == "coef" else eng.step)
    blocks = -(-out_samples // b)
    xv = np.broadcast_to(x[None], (v,) + x.shape) if x.ndim == 2 else x
    xb = np.zeros((v, 2, blocks * b), np.float32)
    xb[..., : xv.shape[-1]] = xv
    outs = []
    for t in range(blocks):
        xi = jnp.asarray(xb[..., t * b: (t + 1) * b])
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


def test_offline_per_voice_input():
    """Per-voice program material [V, 2, T] — the WavSource convention —
    bounces too, static and automated alike."""
    from tpu_audio.runtime.stream import MidiSchedule

    rng = np.random.default_rng(7)
    model = build_model(num_voices=2)
    b = model.engine.block
    x = (rng.standard_normal((2, 2, 44 * b)) * 0.1).astype(np.float32)
    out = render_offline(model, x, segments=3)
    ref = stream_reference(build_model(num_voices=2), x, out.shape[-1])
    np.testing.assert_allclose(out, ref, atol=3e-5)
    # the two voices heard different material
    assert np.abs(out[0] - out[1]).max() > 1e-3

    def fresh():
        m = build_model(num_voices=2)
        m.control.speed[:] = 20
        _map_all(m.control)
        return m

    model = fresh()
    out = render_offline(model, x, segments=4,
                         schedule=MidiSchedule(list(AUTOMATION)))
    total_blocks = -(-x.shape[-1] // b) + model.engine.history_blocks
    ref = stream_automated(fresh(), x, total_blocks,
                           MidiSchedule(list(AUTOMATION)))
    n = min(out.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(out[..., :n], ref[..., :n], atol=5e-5)

    with pytest.raises(ValueError, match="per-voice"):
        render_offline(build_model(num_voices=1),
                       np.zeros((3, 2, 64), np.float32))


def test_offline_mesh_sharded():
    """The bounce's virtual voices shard over a device mesh (voice-DP
    GSPMD): 4-device output == single-device output, static and
    automated; non-fmajor engines are refused loudly."""
    from tpu_audio.parallel.mesh import make_mesh
    from tpu_audio.runtime.stream import MidiSchedule

    mesh = make_mesh(4, part=1)
    x = program(40 * 32 + 5)
    base = render_offline(build_model(num_voices=2), x, segments=3)
    sharded = render_offline(build_model(num_voices=2), x, segments=3,
                             mesh=mesh)
    assert sharded.shape == base.shape
    np.testing.assert_allclose(sharded, base, atol=3e-5)

    def fresh():
        m = build_model(num_voices=2)
        m.control.speed[:] = 20
        _map_all(m.control)
        return m

    sched = MidiSchedule(list(AUTOMATION))
    auto_base = render_offline(fresh(), x, segments=3, schedule=sched)
    auto_sharded = render_offline(fresh(), x, segments=3, schedule=sched,
                                  mesh=mesh)
    np.testing.assert_allclose(auto_sharded, auto_base, atol=5e-5)

    # cascade bounces shard too (GSPMD voice-DP: the group axis
    # replicates, Vg shards — whole stagger groups per device), static
    # and automated
    def casc():
        m = build_model(engine="cascade", block=16, ir_len=400,
                        cascade_ratio=2)
        m.control.speed[:] = 20
        _map_all(m.control)
        return m

    xc = program(40 * 16 + 5)
    cbase = render_offline(casc(), xc, segments=3)
    csharded = render_offline(casc(), xc, segments=3, mesh=mesh)
    assert csharded.shape == cbase.shape
    np.testing.assert_allclose(csharded, cbase, atol=3e-5)
    cauto = render_offline(casc(), xc, segments=3,
                           schedule=MidiSchedule(list(AUTOMATION)))
    cauto_sh = render_offline(casc(), xc, segments=3, mesh=mesh,
                              schedule=MidiSchedule(list(AUTOMATION)))
    np.testing.assert_allclose(cauto_sh, cauto, atol=5e-5)
    # engines without a voice-DP sharding map are refused loudly
    with pytest.raises(ValueError, match="mesh-sharded"):
        render_offline(build_model(engine="partitioned"), x, mesh=mesh)


def test_offline_chunked_long_track():
    """Bounded-memory chunked bounce == the whole-track bounce (and so
    == streaming), chunk boundaries mid-tail included."""
    model = build_model(num_voices=1)
    x = program(53 * 32 + 11)
    whole = render_offline(model, x, segments=3)
    chunked = render_offline(model, x, segments=3, track_chunk_blocks=17)
    assert chunked.shape == whole.shape
    np.testing.assert_allclose(chunked, whole, atol=3e-5)
    # chunks are shape-identical: every chunk (edges included) reuses ONE
    # compiled step — and a different-length track hits the SAME
    # executables (only the host-side slicing varies)
    sengs = model.engine._offline_engines
    before = {vv: set(s._bounce_fns) for vv, s in sengs.items()}
    chunked2 = render_offline(model, program(31 * 32, seed=9), segments=3,
                              track_chunk_blocks=17)
    assert chunked2.shape[-1] < chunked.shape[-1]
    for vv, s in model.engine._offline_engines.items():
        assert set(s._bounce_fns) == before.get(vv, set(s._bounce_fns)), \
            "a different track length rebuilt chunk executables"
    no_tail = render_offline(model, x, segments=3, track_chunk_blocks=17,
                             include_tail=False)
    assert no_tail.shape[-1] == x.shape[1]
    # chunking composes with mesh sharding and per-voice input
    from tpu_audio.parallel.mesh import make_mesh
    mesh = make_mesh(2, part=1)
    chunked_mesh = render_offline(model, x, segments=3,
                                  track_chunk_blocks=17, mesh=mesh)
    np.testing.assert_allclose(chunked_mesh, whole, atol=3e-5)
    m2 = build_model(num_voices=2)
    rng = np.random.default_rng(3)
    xv = (rng.standard_normal((2, 2, 40 * 32)) * 0.1).astype(np.float32)
    np.testing.assert_allclose(
        render_offline(m2, xv, segments=2, track_chunk_blocks=13),
        render_offline(build_model(num_voices=2), xv, segments=2),
        atol=3e-5)
    # an automation schedule composes with chunking (empty schedule ==
    # static parameters; the full case is test_offline_chunked_automated)
    from tpu_audio.runtime.stream import MidiSchedule
    _map_all(model.control)
    np.testing.assert_allclose(
        render_offline(model, x, segments=3, track_chunk_blocks=17,
                       schedule=MidiSchedule([])),
        whole, atol=5e-5)
    with pytest.raises(ValueError, match=">= 1"):
        render_offline(model, x, track_chunk_blocks=0)


def test_offline_pcm16_wire_and_bucketing():
    """wire='pcm16' bounces the same audio within half a quantization
    step (encoded in-graph, decoded host-side — half the readback
    bytes); bucket_blocks pads the track length to a grid so nearby
    lengths reuse ONE compiled executable set across bounces."""
    model = build_model()
    x = program(37 * 32 + 5)
    ref = render_offline(model, x, segments=4)
    out16 = render_offline(model, x, segments=4, wire="pcm16")
    assert out16.dtype == np.float32 and out16.shape == ref.shape
    np.testing.assert_allclose(out16, np.clip(ref, -1.0, 1.0),
                               atol=0.51 / 32767)
    # bucketing: same audio (the pad is zero input past the tail; segment
    # boundaries move, so MAC reassociation noise applies, not exactness)
    outb = render_offline(model, x, segments=4, bucket_blocks=64)
    assert outb.shape == ref.shape
    np.testing.assert_allclose(outb, ref, atol=3e-5)
    # a nearby track length hits the SAME executables under the bucket
    sengs = model.engine._offline_engines
    before = {vv: set(s._bounce_fns) for vv, s in sengs.items()}
    render_offline(model, program(36 * 32 + 1, seed=5), segments=4,
                   bucket_blocks=64)
    for vv, s in model.engine._offline_engines.items():
        assert set(s._bounce_fns) == before.get(vv, set(s._bounce_fns)), \
            "a bucketed nearby track length rebuilt executables"
    # 'auto' grid composes end to end
    np.testing.assert_allclose(
        render_offline(model, x, segments=4, bucket_blocks="auto"),
        ref, atol=3e-5)
    with pytest.raises(ValueError, match="wire"):
        render_offline(model, x, wire="pcm24")
    with pytest.raises(ValueError, match="bucket_blocks"):
        render_offline(model, x, bucket_blocks=0)


def test_offline_input_wire():
    """input_wire='pcm16' uploads program material as int16: BIT-EXACT
    when the input sits on a 16-bit grid (auto-detected — every 16-bit
    WAV through the reference's /65536 headroom scaling does), half-LSB
    quantization otherwise."""
    from tpu_audio.runtime.stream import MidiSchedule

    model = build_model()
    rng = np.random.default_rng(33)
    # 16-bit-grid input: k/65536, k in int16 range (the wav.cu:13 scale)
    k = rng.integers(-32768, 32768, (2, 31 * 32 + 7)).astype(np.float32)
    xg = k / np.float32(65536.0)
    ref = render_offline(model, xg, segments=3)
    auto = render_offline(model, xg, segments=3, input_wire="auto")
    np.testing.assert_allclose(auto, ref, atol=1e-7)
    explicit = render_offline(model, xg, segments=3, input_wire="pcm16",
                              input_scale=65536.0)
    np.testing.assert_allclose(explicit, ref, atol=1e-7)
    # off-grid input: 'auto' falls back to exact f32; explicit 'pcm16'
    # quantizes within the conv gain of half an input LSB
    xf = (rng.standard_normal((2, 31 * 32)) * 0.1).astype(np.float32)
    ref = render_offline(model, xf, segments=3)
    np.testing.assert_allclose(
        render_offline(model, xf, segments=3, input_wire="auto"), ref,
        atol=1e-7)
    q = render_offline(model, xf, segments=3, input_wire="pcm16")
    np.testing.assert_allclose(q, ref, atol=5e-3)
    assert np.abs(q - ref).max() > 0  # it really quantized
    # composes with automation and chunking
    m = build_model()
    m.control.speed[:] = 20
    _map_all(m.control)
    a_ref = render_offline(m, xg, segments=3,
                           schedule=MidiSchedule(list(AUTOMATION)))
    m2 = build_model()
    m2.control.speed[:] = 20
    _map_all(m2.control)
    np.testing.assert_allclose(
        render_offline(m2, xg, segments=3, input_wire="auto",
                       schedule=MidiSchedule(list(AUTOMATION))),
        a_ref, atol=1e-7)
    np.testing.assert_allclose(
        render_offline(model, xg, segments=3, track_chunk_blocks=11,
                       input_wire="auto"),
        render_offline(model, xg, segments=3, track_chunk_blocks=11),
        atol=1e-7)
    with pytest.raises(ValueError, match="input_wire"):
        render_offline(model, xg, input_wire="pcm24")


def test_engine_init_memoized_and_donation_safe():
    """init_state/init_converged build their jit wrappers ONCE per
    engine instance (a fresh jax.jit per call re-traces and — on remote
    backends — re-loads the executable every bounce), and every call
    still returns FRESH buffers: donating one init state into a step
    must not corrupt another."""
    model = build_model(num_voices=1)
    eng, bank = model.engine, model.spectra
    s1 = eng.init_state()
    s2 = eng.init_state()
    cache = eng.__dict__["_instance_jit_cache"]
    assert "init_state" in cache
    params = jax.tree.map(jnp.asarray, model.control.snapshot())
    c1 = eng.init_converged(bank, params)
    eng.init_converged(bank, params)
    assert "init_coefc" in cache
    step = jax.jit(eng.step_coef_steady, donate_argnums=0)
    step(c1, bank, params, jnp.ones((1, 2, 32)) * 0.1)
    # s1/s2 are distinct, still-live zero states after c1's donation
    assert not np.asarray(s1.fdl).any()
    assert not np.asarray(s2.fdl).any()
    assert s1.fdl is not s2.fdl


def test_offline_auto_segments_and_mono():
    model = build_model(num_voices=1)
    x = program(30 * 32)[0]  # mono [T]
    out = render_offline(model, x)  # auto segment count
    ref = stream_reference(model, np.stack([x, x]), out.shape[-1])
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_offline_nonfinite_output_raises_on_every_wire():
    """The in-graph finiteness accumulator (offline._collect) must catch
    non-finite engine output on the pcm16 wire too — the encoder clips
    NaN into ordinary int16 values, so no wire-side check could."""
    import pytest

    model = build_model(num_voices=1)
    x = program(10 * 32)
    x[0, 40] = np.nan
    for wire in ("f32", "pcm16"):
        with pytest.raises(RuntimeError, match="non-finite"):
            render_offline(model, x, segments=2, wire=wire)
    # and a clean input still renders on both wires
    out = render_offline(model, program(10 * 32), segments=2, wire="pcm16")
    assert np.isfinite(out).all()


def test_offline_background_precompile_opt_in(monkeypatch):
    """TPU_AUDIO_OFFLINE_PRECOMPILE=1 AOT-compiles the step from a worker
    thread (cold-start overlap); the rendered output must be identical
    and the thread must never fail the bounce."""
    model = build_model(num_voices=1)
    x = program(10 * 32)
    base = render_offline(model, x, segments=2)
    monkeypatch.setenv("TPU_AUDIO_OFFLINE_PRECOMPILE", "1")
    model2 = build_model(num_voices=1)
    out = render_offline(model2, x, segments=2)
    np.testing.assert_array_equal(out, base)


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


SETTINGS = """
conv.count 2
conv[0].fftSize 2048
conv[0].maxPredelay 128
conv[0].index {index}
conv[0].cc.select 21
conv[0].cc.wet 22
conv[0].cc.speed 24
conv[0].value.select 1
conv[0].value.predelay 16
conv[0].value.dry 0.4
conv[0].value.wet 0.6
conv[0].value.level 0.9
conv[1].fftSize 2048
conv[1].maxPredelay 128
conv[1].index {index}
conv[1].cc.select 21
conv[1].cc.wet 22
conv[1].cc.speed 24
conv[1].value.select 0
conv[1].value.predelay 16
conv[1].value.dry 0.4
conv[1].value.wet 0.6
conv[1].value.level 0.9
"""


def test_cli_offline_matches_streamed(tmp_path):
    """--offline writes the same audio the streaming session writes
    (16-bit WAV quantization both sides), plus the flushed tail."""
    from tpu_audio.app.main import main
    from tpu_audio.io.index import write_index
    from tpu_audio.io.wav import read_wav, write_wav

    rng = np.random.default_rng(0)
    paths = []
    for k in range(2):
        ir = rng.uniform(-0.3, 0.3, (150, 2)).astype(np.float32)
        write_wav(tmp_path / f"ir{k}.wav", ir, 44100)
        paths.append(str(tmp_path / f"ir{k}.wav"))
    idx = tmp_path / "bank.index"
    write_index(idx, paths)
    sfile = tmp_path / "settings.txt"
    sfile.write_text(SETTINGS.format(index=idx))
    x = rng.uniform(-0.2, 0.2, (41 * 64, 2)).astype(np.float32)
    write_wav(tmp_path / "in.wav", x, 44100, scale="full")

    base = ["--settings", str(sfile), "--input", str(tmp_path / "in.wav"),
            "--block-size", "64", "--quiet"]
    assert main(base + ["--output", str(tmp_path / "stream.wav")]) == 0
    assert main(base + ["--output", str(tmp_path / "off.wav"),
                        "--offline", "3"]) == 0
    streamed = read_wav(tmp_path / "stream.wav", scale="full",
                        verbose=False).stereo()
    bounced = read_wav(tmp_path / "off.wav", scale="full",
                       verbose=False).stereo()
    assert bounced.shape[0] > streamed.shape[0]  # tail flushed
    n = streamed.shape[0]
    np.testing.assert_allclose(bounced[:n], streamed, atol=4 / 32768)

    # LIVE flags are refused loudly; scripted schedules are not live
    assert main(base + ["--offline", "--midi-fifo", "x"]) == 2

    # automated bounce: a scripted --midi schedule bounces offline and
    # matches the streaming session performing the same events (16-bit
    # WAV quantization on both sides)
    sched = tmp_path / "auto.txt"
    sched.write_text("6 B0 15 7F   # select last IR (crossfade)\n"
                     "18 B0 16 50  # wet change mid-fade\n")
    assert main(base + ["--output", str(tmp_path / "stream_a.wav"),
                        "--midi", str(sched)]) == 0
    assert main(base + ["--output", str(tmp_path / "off_a.wav"),
                        "--offline", "3", "--midi", str(sched)]) == 0
    streamed_a = read_wav(tmp_path / "stream_a.wav", scale="full",
                          verbose=False).stereo()
    bounced_a = read_wav(tmp_path / "off_a.wav", scale="full",
                         verbose=False).stereo()
    n = streamed_a.shape[0]
    np.testing.assert_allclose(bounced_a[:n], streamed_a, atol=4 / 32768)
    # the automation audibly changed the program vs the static bounce
    assert np.abs(bounced_a[:n] - bounced[:n]).max() > 10 / 32768


def _map_all(control):
    from tpu_audio.engine.params import CCMapping
    for v in range(control.num_voices):
        for ch in range(2):
            control.set_mapping(v, ch, CCMapping(
                message=0xB0, select=0x15, wet=0x16, predelay=0x17,
                speed=0x18, dry=0x19, pan_wet=0x1A, level=0x1B))


AUTOMATION = [
    (8, "", bytes([0xB0, 0x15, 0x40])),   # select IR 1 (crossfade)
    (30, "", bytes([0xB0, 0x16, 0x46])),  # wet change mid-fade
    (41, "", bytes([0xB0, 0x15, 0x7F])),  # re-select IR 2 (interrupts)
    (55, "", bytes([0xB0, 0x17, 0x40])),  # predelay jump
    (70, "", bytes([0xB0, 0x18, 0x0A])),  # crossfade speed change
    (85, "", bytes([0xB0, 0x15, 0x20])),  # select IR 0; fade rings into tail
]


def stream_automated(model, x, total_blocks, schedule):
    """The REAL streaming session (collapse_pure + indexed/steady step
    selection + per-block countdown) driven by the same MIDI schedule —
    the ground truth the automated bounce must reproduce. `x` may be
    shared [2, T] or per-voice [V, 2, T]."""
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import StreamSession

    b = model.engine.block
    xpad = np.zeros(x.shape[:-1] + (total_blocks * b,), np.float32)
    xpad[..., : x.shape[-1]] = x
    sink = WavSink("/dev/null", keep_data=True)
    sess = StreamSession(model.engine, model.spectra, model.control,
                         WavSource(xpad, model.engine.num_voices, b),
                         sink, warmup=0, donate=False)
    params = jax.tree.map(jnp.asarray, model.control.snapshot())
    sess.run(model.engine.init_converged(model.spectra, params),
             midi=schedule)
    return sink.data


@pytest.mark.parametrize("engine,kwargs,segments", [
    ("fmajor", {}, 5),            # boundaries straddle fades + warm-ups
    ("fmajor", {}, 1),            # degenerate: pure sequential replay
    ("fmajor", {"mac_dtype": "bf16"}, 4),
    ("fmajor", {"mac_strategy": "selected"}, 5),
    ("cascade", {"cascade_ratio": 2, "block": 16}, 5),
])
def test_offline_automated_equals_streamed(engine, kwargs, segments):
    """A scripted MIDI timeline bounced time-parallel == the streaming
    session performing it live: crossfades mid-segment, an interrupted
    re-select, wet/predelay/speed changes, and a fade ringing across
    segment boundaries into the tail."""
    from tpu_audio.runtime.stream import MidiSchedule

    def fresh():
        m = build_model(engine=engine, **kwargs)
        m.control.speed[:] = 20
        _map_all(m.control)
        return m

    model = fresh()
    b = model.engine.block
    x = program(115 * b + 9)
    out = render_offline(model, x, segments=segments,
                         schedule=MidiSchedule(list(AUTOMATION)))
    total_blocks = -(-x.shape[1] // b) + model.engine.history_blocks
    ref = stream_automated(fresh(), x, total_blocks,
                           MidiSchedule(list(AUTOMATION)))
    n = min(out.shape[-1], ref.shape[-1])
    assert np.abs(ref[..., :n]).max() > 1e-3
    np.testing.assert_allclose(out[..., :n], ref[..., :n], atol=5e-5)


@pytest.mark.parametrize("seed,segments", [(11, 8), (12, 3)])
def test_offline_automated_fuzz(seed, segments):
    """Dense randomized CC traffic (select/wet/dry/predelay/speed/pan,
    every few blocks, including block 0 and events in the tail window,
    fades overlapping every segment boundary and each other) == the
    streaming session, with no spacing constraints — the automation
    replay's design claim."""
    from tpu_audio.runtime.stream import MidiSchedule

    rng = np.random.default_rng(seed)
    controllers = [0x15, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x1B]
    events, t = [], 0
    while t < 140:
        events.append((t, "", bytes([0xB0, int(rng.choice(controllers)),
                                     int(rng.integers(0, 128))])))
        t += int(rng.integers(1, 9))

    def fresh():
        m = build_model(num_voices=2)
        m.control.speed[:] = int(rng.integers(8, 60))
        _map_all(m.control)
        return m

    state = rng.bit_generator.state
    model = fresh()
    b = model.engine.block
    x = program(130 * b, seed=seed + 100)
    out = render_offline(model, x, segments=segments,
                         schedule=MidiSchedule(list(events)))
    total_blocks = -(-x.shape[1] // b) + model.engine.history_blocks
    rng.bit_generator.state = state  # identical speed draw
    ref = stream_automated(fresh(), x, total_blocks,
                           MidiSchedule(list(events)))
    n = min(out.shape[-1], ref.shape[-1])
    assert np.abs(ref[..., :n]).max() > 1e-3
    np.testing.assert_allclose(out[..., :n], ref[..., :n], atol=5e-5)


@pytest.mark.parametrize("kwargs", [{}, {"mac_strategy": "selected"}])
def test_offline_chunked_automated(kwargs):
    """track_chunk_blocks composes with an automation schedule on fmajor
    engines: the host replay runs once over the global timeline and every
    chunk gathers it at absolute block indices — chunked == whole-track
    automated bounce == the real streaming session, with chunk boundaries
    landing mid-fade and events falling inside chunk history prefixes."""
    from tpu_audio.runtime.stream import MidiSchedule

    def fresh():
        m = build_model(**kwargs)
        m.control.speed[:] = 20
        _map_all(m.control)
        return m

    model = fresh()
    b = model.engine.block
    x = program(115 * b + 9)
    whole = render_offline(model, x, segments=4,
                           schedule=MidiSchedule(list(AUTOMATION)))
    m2 = fresh()
    chunked = render_offline(m2, x, segments=4, track_chunk_blocks=23,
                             schedule=MidiSchedule(list(AUTOMATION)))
    assert chunked.shape == whole.shape
    # 'selected' re-expands the span snapshot at every chunk's segment
    # starts (one f32 reassociation of sum_k g_k*bank_k vs the stream's
    # incremental base) — many chunks accumulate slightly more noise than
    # the whole-track bounce's handful of expand points
    tol = 1e-4 if kwargs.get("mac_strategy") == "selected" else 5e-5
    np.testing.assert_allclose(chunked, whole, atol=tol)
    # every chunk (boundaries straddling fades included) shared ONE
    # compiled step: the absolute offset rides as a device scalar
    autos = [k for s in m2.engine._offline_engines.values()
             for k in s._bounce_fns if k[0] == "auto"]
    assert len(autos) == 1, autos
    # and the chunked bounce matches the REAL streaming session
    total_blocks = -(-x.shape[1] // b) + model.engine.history_blocks
    ref = stream_automated(fresh(), x, total_blocks,
                           MidiSchedule(list(AUTOMATION)))
    n = min(chunked.shape[-1], ref.shape[-1])
    assert np.abs(ref[..., :n]).max() > 1e-3
    np.testing.assert_allclose(chunked[..., :n], ref[..., :n], atol=tol)


def test_offline_chunked_automated_fuzz_and_mesh():
    """Randomized CC traffic through the chunked automation path (chunk
    size coprime to the fade/segment grid) == the whole-track bounce,
    and the chunked+automated+mesh composition holds too."""
    from tpu_audio.parallel.mesh import make_mesh
    from tpu_audio.runtime.stream import MidiSchedule

    rng = np.random.default_rng(21)
    controllers = [0x15, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x1B]
    events, t = [], 0
    while t < 100:
        events.append((t, "", bytes([0xB0, int(rng.choice(controllers)),
                                     int(rng.integers(0, 128))])))
        t += int(rng.integers(1, 11))

    def fresh():
        m = build_model(num_voices=2)
        m.control.speed[:] = 25
        _map_all(m.control)
        return m

    x = program(95 * 32 + 13, seed=22)
    whole = render_offline(fresh(), x, segments=3,
                           schedule=MidiSchedule(list(events)))
    chunked = render_offline(fresh(), x, segments=3, track_chunk_blocks=19,
                             schedule=MidiSchedule(list(events)))
    np.testing.assert_allclose(chunked, whole, atol=5e-5)
    mesh = make_mesh(2, part=1)
    chunked_mesh = render_offline(fresh(), x, segments=3,
                                  track_chunk_blocks=19, mesh=mesh,
                                  schedule=MidiSchedule(list(events)))
    np.testing.assert_allclose(chunked_mesh, whole, atol=5e-5)


def test_offline_chunked_automated_cascade():
    """Cascade automation chunks too: the chunk grid and history prefix
    round up to the stagger ratio, so every chunk's absolute offset
    (lo - hist) is phase-aligned with the stream's tail schedule (group
    t % ratio) — chunked == whole-track automated bounce == the real
    streaming session. The requested chunk size is ODD to exercise the
    grid rounding, and chunk boundaries land mid-fade."""
    from tpu_audio.runtime.stream import MidiSchedule

    def fresh():
        m = build_model(engine="cascade", block=16, ir_len=400,
                        cascade_ratio=2)
        m.control.speed[:] = 20
        _map_all(m.control)
        return m

    model = fresh()
    b = model.engine.block
    x = program(115 * b + 9)
    whole = render_offline(model, x, segments=4,
                           schedule=MidiSchedule(list(AUTOMATION)))
    m2 = fresh()
    chunked = render_offline(m2, x, segments=4, track_chunk_blocks=23,
                             schedule=MidiSchedule(list(AUTOMATION)))
    assert chunked.shape == whole.shape
    np.testing.assert_allclose(chunked, whole, atol=5e-5)
    # every chunk shared ONE compiled step (the absolute offset rides as
    # a device scalar), grid rounding included
    autos = [k for s in m2.engine._offline_engines.values()
             for k in s._bounce_fns if k[0] == "auto"]
    assert len(autos) == 1, autos
    total_blocks = -(-x.shape[1] // b) + model.engine.history_blocks
    ref = stream_automated(fresh(), x, total_blocks,
                           MidiSchedule(list(AUTOMATION)))
    n = min(chunked.shape[-1], ref.shape[-1])
    assert np.abs(ref[..., :n]).max() > 1e-3
    np.testing.assert_allclose(chunked[..., :n], ref[..., :n], atol=5e-5)


def test_offline_automated_guards():
    from tpu_audio.runtime.stream import MidiSchedule

    sched = MidiSchedule([(2, "", bytes([0xB0, 0x15, 0x40]))])
    # engines without an in-graph fade replay are refused loudly
    model = build_model(engine="partitioned")
    with pytest.raises(ValueError, match="coef-fade"):
        render_offline(model, program(64), schedule=sched)
    csel = build_model(engine="cascade", block=16, ir_len=400,
                       cascade_ratio=2, mac_strategy="selected")
    with pytest.raises(ValueError, match="coef-fade"):
        render_offline(csel, program(64), schedule=sched)
    # a mid-fade control plane is not a valid bounce entry
    model = build_model()
    _map_all(model.control)
    model.control.vsteps[:] = 7
    with pytest.raises(ValueError, match="converged"):
        render_offline(model, program(64), schedule=sched)
    # events past the bounce are ignored with a warning, not an error
    model = build_model(num_voices=1)
    _map_all(model.control)
    late = MidiSchedule([(10 ** 6, "", bytes([0xB0, 0x15, 0x40]))])
    out = render_offline(model, program(20 * 32), segments=2, schedule=late)
    ref = render_offline(build_model(num_voices=1), program(20 * 32),
                         segments=2)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_offline_rejects_working_set_and_bad_segments():
    model = build_model(engine="fmajor", num_irs=6, bank_capacity=3)
    with pytest.raises(ValueError, match="working-set"):
        render_offline(model, program(64), segments=2)
    with pytest.raises(ValueError, match="segments"):
        render_offline(build_model(num_voices=1), program(64), segments=0)
    with pytest.raises(ValueError, match="stereo"):
        render_offline(build_model(num_voices=1),
                       np.zeros((3, 64), np.float32))


def test_offline_chunked_automated_cascade_fuzz_and_mesh():
    """Randomized CC traffic through the CASCADE chunked automation path:
    random chunk sizes (coprime to the ratio — the grid rounding engages)
    == the whole-track bounce, and the chunked+automated+mesh cascade
    composition holds too."""
    from tpu_audio.parallel.mesh import make_mesh
    from tpu_audio.runtime.stream import MidiSchedule

    rng = np.random.default_rng(31)
    controllers = [0x15, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x1B]
    events, t = [], 0
    while t < 90:
        events.append((t, "", bytes([0xB0, int(rng.choice(controllers)),
                                     int(rng.integers(0, 128))])))
        t += int(rng.integers(1, 10))

    def fresh():
        m = build_model(engine="cascade", block=16, ir_len=400,
                        cascade_ratio=4, num_voices=4)
        m.control.speed[:] = 22
        _map_all(m.control)
        return m

    x = program(88 * 16 + 11, seed=32)
    whole = render_offline(fresh(), x, segments=3,
                           schedule=MidiSchedule(list(events)))
    for chunk in (17, 31):                        # both coprime to ratio 4
        chunked = render_offline(fresh(), x, segments=3,
                                 track_chunk_blocks=chunk,
                                 schedule=MidiSchedule(list(events)))
        np.testing.assert_allclose(chunked, whole, atol=5e-5,
                                   err_msg=f"chunk={chunk}")
    mesh = make_mesh(2, part=1)
    chunked_mesh = render_offline(fresh(), x, segments=3,
                                  track_chunk_blocks=17, mesh=mesh,
                                  schedule=MidiSchedule(list(events)))
    np.testing.assert_allclose(chunked_mesh, whole, atol=5e-5)
