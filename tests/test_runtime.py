import numpy as np
import pytest
from scipy.signal import fftconvolve

from tpu_audio.engine import ControlPlane, IRBank
from tpu_audio.models.reverb import ConvolutionReverb
from tpu_audio.runtime.backends import (
    ImpulseSource, LoopbackBuffer, NoiseSource, SilenceSource, WavSink,
    WavSource,
)
from tpu_audio.runtime.checkpoint import load_checkpoint, save_checkpoint
from tpu_audio.runtime.stream import MidiSchedule


def small_model(num_voices=2, block=64, ir_len=200, num_irs=3, variant="coef",
                engine="partitioned", seed=0):
    rng = np.random.default_rng(seed)
    bank = IRBank()
    for _ in range(num_irs):
        ir = rng.standard_normal((2, ir_len)).astype(np.float32)
        bank.append(ir * (0.5 / np.abs(ir).max()))
    return ConvolutionReverb(bank, num_voices=num_voices, block=block,
                             engine=engine, variant=variant, fft_size=1024,
                             max_predelay=128)


# --------------------------------------------------------------- backends

def test_wav_source_tiles_voices(tmp_path):
    from tpu_audio.io.wav import write_wav
    data = np.random.default_rng(0).uniform(-0.4, 0.4, (300, 2)).astype(np.float32)
    write_wav(tmp_path / "in.wav", data, 44100)
    src = WavSource(tmp_path / "in.wav", num_voices=4, block=128, scale="full")
    b1 = src.read()
    assert b1.shape == (4, 2, 128)
    np.testing.assert_allclose(b1[0], b1[3])
    b2 = src.read()
    b3 = src.read()
    assert b3.shape == (4, 2, 128)
    np.testing.assert_allclose(b3[..., 44:], 0.0)  # zero-padded tail
    assert src.read() is None


def test_wav_source_loop():
    data = np.arange(10, dtype=np.float32).reshape(1, 1, 10)
    data = np.repeat(data, 2, axis=1)
    src = WavSource(data, num_voices=1, block=8, loop=True, max_blocks=3)
    blocks = [src.read() for _ in range(4)]
    assert blocks[3] is None
    joined = np.concatenate(blocks[:3], axis=-1)[0, 0]
    np.testing.assert_allclose(joined, np.arange(24) % 10)


def test_impulse_and_silence_sources():
    imp = ImpulseSource(1, 16, 2)
    b0, b1 = imp.read(), imp.read()
    assert b0[0, 0, 0] == 1.0 and b0[0, 0, 1:].max() == 0.0
    assert b1.max() == 0.0
    assert imp.read() is None
    sil = SilenceSource(1, 16, 1)
    assert sil.read().max() == 0.0
    assert sil.read() is None


def test_wav_sink_roundtrip(tmp_path):
    sink = WavSink(tmp_path / "out.wav", 44100, bits=32)
    sink.write(np.full((1, 2, 8), 0.25, np.float32))
    sink.write(np.full((1, 2, 8), -0.5, np.float32))
    sink.close()
    from tpu_audio.io.wav import read_wav
    w = read_wav(tmp_path / "out.wav", scale="full", verbose=False)
    assert w.num_frames == 16
    np.testing.assert_allclose(w.frames[0], [0.25, 0.25])
    np.testing.assert_allclose(w.frames[-1], [-0.5, -0.5])


def test_loopback_buffer():
    lb = LoopbackBuffer()
    lb.write(np.ones((1, 2, 4)))
    lb.write(np.zeros((1, 2, 4)))
    src = lb.as_source()
    assert src.read().max() == 1.0
    assert src.read().max() == 0.0
    assert src.read() is None


# --------------------------------------------------------------- midi schedule

def test_midi_schedule_parse_and_pop():
    sched = MidiSchedule.parse("""
    # select IR 2 on block 5
    5 B0 15 40
    10 hw:2,0 B0 17 7F
    3 B0 18 00
    """)
    assert sched.pop_due(0) == []
    due = sched.pop_due(5)  # pops blocks 3 and 5
    assert due == [("", bytes([0xB0, 0x18, 0x00])), ("", bytes([0xB0, 0x15, 0x40]))]
    assert sched.pop_due(9) == []
    assert sched.pop_due(10) == [("hw:2,0", bytes([0xB0, 0x17, 0x7F]))]


# --------------------------------------------------------------- stream session

@pytest.mark.parametrize("variant", ["coef", "materialized"])
def test_stream_end_to_end_matches_offline(variant):
    """Full stack: WavSource -> StreamSession(jitted engine) -> WavSink
    equals offline convolution."""
    model = small_model(num_voices=2, variant=variant)
    model.control.dry[:] = 0.0
    model.control.wet[:] = 1.0
    model.control.select[:] = 1
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 2, 64 * 10)) * 0.05).astype(np.float32)
    source = WavSource(x, num_voices=2, block=64)
    sink = WavSink("/dev/null", 44100, keep_data=True)
    state, summary = model.process(source, sink)
    got = sink.data
    assert got.shape == (2, 2, 640)
    ir = model.bank.ir(1)
    for v in range(2):
        for o in range(2):
            want = (fftconvolve(x[v, 0], ir[o]) + fftconvolve(x[v, 1], ir[o]))[:640]
            np.testing.assert_allclose(got[v, o], np.clip(want, -1, 1), atol=3e-4)
    assert summary["blocks"] == 0  # 10 blocks, all inside warmup=10
    assert summary["num_voices"] == 2


def test_stream_midi_select_triggers_collapse_and_steady_switch():
    """Coef engine through the full runtime: IR re-select via scripted MIDI
    must collapse, crossfade, and land on the new IR's response."""
    from tpu_audio.engine.params import CCMapping
    model = small_model(num_voices=1, num_irs=2, ir_len=128)
    model.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    model.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
    model.control.dry[:] = 0.0
    model.control.wet[:] = 1.0
    model.control.speed[:] = 4

    n_blocks = 120
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((1, 2, 64 * n_blocks)) * 0.05).astype(np.float32)
    # value 64 -> select 64*2//128 = 1
    midi = MidiSchedule([(20, "", bytes([0xB0, 0x15, 64]))])
    source = WavSource(x, num_voices=1, block=64)
    sink = WavSink("/dev/null", 44100, keep_data=True)
    state, summary = model.process(source, sink, midi=midi, warmup=0)
    got = sink.data

    ir = model.bank.ir(1)
    tail = slice(-64 * 4, None)
    for o in range(2):
        want = (fftconvolve(x[0, 0], ir[o]) + fftconvolve(x[0, 1], ir[o]))
        want = np.clip(want[: 64 * n_blocks], -1, 1)
        np.testing.assert_allclose(got[0, o][tail], want[tail], atol=1e-3)
    assert summary["blocks"] == n_blocks


def test_stream_deadline_watchdog():
    model = small_model(num_voices=1)
    missed = []
    source = NoiseSource(1, 64, 5)
    session = model.session(source, WavSink("/dev/null", keep_data=True), warmup=0,
                            on_missed_deadline=lambda b, e: missed.append(b))
    # force an absurd deadline so every block misses
    session.timer.deadline_s = 1e-12
    session.run(model.init_state())
    assert session.timer.missed == 5
    assert len(missed) == 5


def test_stream_realtime_pacing():
    model = small_model(num_voices=1, block=64)
    source = SilenceSource(1, 64, 6)
    session = model.session(source, WavSink("/dev/null", keep_data=True), realtime=True,
                            warmup=0)
    import time
    t0 = time.perf_counter()
    session.run(model.init_state())
    elapsed = time.perf_counter() - t0
    # 6 blocks at 64/44100 s; allow generous slack for jit compile inside
    assert elapsed >= 5 * 64 / 44100


# --------------------------------------------------------------- checkpoint

def test_checkpoint_roundtrip_resumes_bit_exact(tmp_path):
    model = small_model(num_voices=2)
    model.control.wet[:] = 0.9
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 2, 64 * 8)) * 0.05).astype(np.float32)

    # run 4 blocks, checkpoint, run 4 more
    src_a = WavSource(x[..., : 64 * 4], num_voices=2, block=64)
    sink_a = WavSink("/dev/null", keep_data=True)
    state = model.init_state()
    session = model.session(src_a, sink_a, donate=False)
    state = session.run(state)
    save_checkpoint(tmp_path / "ckpt.npz", state, model.control,
                    meta={"block_index": 4})
    src_b = WavSource(x[..., 64 * 4:], num_voices=2, block=64)
    sink_b = WavSink("/dev/null", keep_data=True)
    state = session2_state = model.session(src_b, sink_b, donate=False).run(state)
    full_tail = sink_b.data

    # fresh model restores the checkpoint and must produce identical output
    model2 = small_model(num_voices=2)
    state2, meta = load_checkpoint(tmp_path / "ckpt.npz",
                                   model2.engine.init_state(), model2.control)
    assert meta["block_index"] == 4
    assert model2.control.wet[0, 0] == np.float32(0.9)
    src_c = WavSource(x[..., 64 * 4:], num_voices=2, block=64)
    sink_c = WavSink("/dev/null", keep_data=True)
    model2.session(src_c, sink_c, donate=False).run(state2)
    np.testing.assert_array_equal(sink_c.data, full_tail)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    model = small_model(num_voices=2)
    state = model.init_state()
    save_checkpoint(tmp_path / "c.npz", state, model.control)
    other = small_model(num_voices=1)
    with pytest.raises(ValueError):
        load_checkpoint(tmp_path / "c.npz", other.engine.init_state(),
                        other.control)


def test_underrun_policy_silence():
    """Live-source underrun substitutes silence and keeps streaming."""

    class DropoutSource:
        def __init__(self, n):
            self.n = n
            self.i = 0

        def read(self):
            self.i += 1
            if self.i > self.n:
                return None if self.i > self.n + 5 else None
            if self.i % 3 == 0:
                return None  # producer hiccup
            return np.full((1, 2, 64), 0.1, np.float32)

    model = small_model(num_voices=1)
    src = DropoutSource(9)
    session = model.session(src, WavSink("/dev/null", keep_data=True), warmup=0,
                            underrun_policy="silence")
    session.run(model.init_state(), max_blocks=12)
    s = session.summary()
    assert s["blocks_streamed"] == 12
    assert s["underruns"] >= 3


def test_underrun_policy_validation():
    model = small_model(num_voices=1)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        model.session(SilenceSource(1, 64, 1), WavSink("/dev/null", keep_data=True),
                      underrun_policy="bogus")


@pytest.mark.parametrize("chunk", [4, 8])
def test_chunked_session_matches_blockwise(chunk):
    """chunk_blocks > 1 (scan N blocks per dispatch) must produce identical
    audio to the block-by-block session, crossfade countdown included."""
    from tpu_audio.engine.params import CCMapping

    def build():
        m = small_model(num_voices=1, num_irs=2, ir_len=128)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
        m.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
        m.control.dry[:] = 0.2
        m.control.wet[:] = 0.9
        m.control.speed[:] = 7
        return m

    rng = np.random.default_rng(9)
    n_blocks = 26  # not a multiple of chunk: exercises the partial tail
    x = (rng.standard_normal((1, 2, 64 * n_blocks)) * 0.05).astype(np.float32)
    midi = lambda: MidiSchedule([(8, "", bytes([0xB0, 0x15, 64]))])

    m1 = build()
    s1 = WavSink("/dev/null", keep_data=True)
    m1.process(WavSource(x, 1, 64), s1, midi=midi(), warmup=0)

    m2 = build()
    s2 = WavSink("/dev/null", keep_data=True)
    m2.process(WavSource(x, 1, 64), s2, midi=midi(), warmup=0,
               chunk_blocks=chunk)

    assert s2.data.shape == s1.data.shape
    # MIDI applies at chunk boundaries in chunked mode: the select at block 8
    # lands at the same block only when 8 % chunk == 0; compare regions where
    # behaviour must match exactly (before the event for chunk=4/8: 8%4==0
    # and 8%8==0, so trajectories are identical throughout)
    np.testing.assert_allclose(s2.data, s1.data, atol=3e-5)
    assert m2.control.vsteps[0, 0] == m1.control.vsteps[0, 0]


def test_monolithic_engine_in_session():
    """The non-coef session path (engine.step, no collapse machinery) must
    stream correctly end to end."""
    model = small_model(num_voices=1, engine="monolithic")
    model.control.dry[:] = 0.0
    model.control.wet[:] = 1.0
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((1, 2, 64 * 8)) * 0.05).astype(np.float32)
    sink = WavSink("/dev/null", keep_data=True)
    model.process(WavSource(x, 1, 64), sink, warmup=0)
    got = sink.data
    ir = model.bank.ir(0)
    want = fftconvolve(x[0, 0], ir[0]) + fftconvolve(x[0, 1], ir[0])
    np.testing.assert_allclose(got[0, 0], np.clip(want[: 64 * 8], -1, 1),
                               atol=3e-4)


def test_checkpoint_roundtrip_fmajor_mid_fade(tmp_path):
    """Production-engine (fmajor, ring mode) checkpoints carry a bfloat16
    'base' fade-snapshot leaf; it must save/restore bit-exactly and a
    mid-crossfade resume must keep fading (not jump to the steady step)."""
    from tpu_audio.engine.params import CCMapping

    def build():
        m = small_model(num_voices=2, engine="fmajor", num_irs=2, ir_len=128)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
        m.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
        m.control.wet[:] = 0.9
        m.control.speed[:] = 20
        return m

    rng = np.random.default_rng(13)
    x = (rng.standard_normal((2, 2, 64 * 10)) * 0.05).astype(np.float32)
    select_at_2 = lambda: MidiSchedule([(2, "", bytes([0xB0, 0x15, 64]))])

    # uninterrupted run: select at block 2 starts a 20-block fade.
    # (pin all sessions to the general fade path: a restored session is
    # required to fall back to it, and this test is about state carry —
    # indexed-vs-general equivalence is covered in test_fmajor.py)
    m1 = build()
    s1 = WavSink("/dev/null", keep_data=True)
    sess1 = m1.session(WavSource(x, 2, 64), s1, warmup=0, donate=False)
    sess1._step_indexed = None
    sess1.run(m1.init_state(), midi=select_at_2())

    # interrupted run: checkpoint at block 5 (fade in flight), restore into
    # a FRESH model and finish the stream
    m2 = build()
    s2a = WavSink("/dev/null", keep_data=True)
    sess2 = m2.session(WavSource(x[..., : 64 * 5], 2, 64), s2a, warmup=0,
                       donate=False)
    sess2._step_indexed = None
    state = sess2.run(m2.init_state(), midi=select_at_2())
    assert (m2.control.vsteps > 0).any(), "fade must be in flight"
    save_checkpoint(tmp_path / "fade.npz", state, m2.control)

    m3 = build()
    state3, _ = load_checkpoint(tmp_path / "fade.npz",
                                m3.engine.init_state(), m3.control)
    # the restored bf16 base leaf must be bit-identical
    base2 = np.asarray(state.base).view(np.uint16)
    base3 = np.asarray(state3.base).view(np.uint16)
    np.testing.assert_array_equal(base2, base3)
    s2b = WavSink("/dev/null", keep_data=True)
    sess3 = m3.session(WavSource(x[..., 64 * 5:], 2, 64), s2b, warmup=0,
                       donate=False)
    sess3.run(state3)
    assert getattr(sess3, "indexed_blocks", 0) == 0  # restored base: general

    resumed = np.concatenate([s2a.data, s2b.data], axis=-1)
    np.testing.assert_allclose(resumed, s1.data, atol=2e-6)


def test_underrun_silence_unbounded_live():
    """underrun_policy='silence' with max_blocks=None (the live-ring case):
    the session must substitute silence and keep running, stopping only at
    the consecutive-underrun cap — not on the first hiccup."""

    class HiccupThenDry:
        def __init__(self):
            self.i = 0

        def read(self):
            self.i += 1
            if self.i == 3:
                return None  # one mid-stream hiccup
            if self.i <= 6:
                return np.full((1, 2, 64), 0.1, np.float32)
            return None  # producer gone

    model = small_model(num_voices=1)
    session = model.session(HiccupThenDry(), WavSink("/dev/null", keep_data=True),
                            warmup=0, underrun_policy="silence",
                            max_consecutive_underruns=4)
    session.run(model.init_state(), max_blocks=None)
    s = session.summary()
    # 5 real blocks + 1 substituted hiccup + 4 substituted tail blocks
    assert s["blocks_streamed"] == 10
    assert s["underruns"] == 6  # 1 hiccup + 4 tail + the stopping read


def test_wavsink_streams_to_disk_incrementally(tmp_path):
    """WavSink writes blocks to disk as they arrive (bounded memory) and the
    resulting file matches the streamed audio; .data requires keep_data."""
    from tpu_audio.io.wav import read_wav

    rng = np.random.default_rng(7)
    blocks = [(rng.standard_normal((3, 2, 64)) * 0.3).astype(np.float32)
              for _ in range(5)]

    sink = WavSink(tmp_path / "s.wav", 44100, voice=1, bits=32)
    for b in blocks:
        sink.write(b)
    assert sink._blocks is None  # nothing buffered
    with pytest.raises(RuntimeError):
        _ = sink.data
    sink.close()
    got = read_wav(tmp_path / "s.wav", scale="full", verbose=False).stereo().T
    want = np.concatenate(blocks, axis=-1)[1]
    np.testing.assert_allclose(got, want, atol=1e-7)

    # voice="all" writes one streaming file per voice
    sink = WavSink(tmp_path / "a.wav", 44100, voice="all", bits=32)
    for b in blocks:
        sink.write(b)
    sink.close()
    for v in range(3):
        got = read_wav(tmp_path / f"a_v{v:03d}.wav", scale="full",
                       verbose=False).stereo().T
        np.testing.assert_allclose(
            got, np.concatenate(blocks, axis=-1)[v], atol=1e-7)


def test_settings_predelay_clamped_to_max():
    """Out-of-range settings predelay is clamped (not silently muted by the
    fmajor block-slot scatter)."""
    from tpu_audio.io.settings import Settings

    s = Settings().parse("conv[0].value.predelay 9999\n")
    cp = ControlPlane(1, 1, max_predelay=128)
    cp.load_initial_values(s, 0, 0, 0)
    assert cp.predelay[0, 0] == 128


def test_resilient_session_recovers_mid_stream(tmp_path):
    """Failure recovery (SURVEY §5): a device-session failure mid-stream is
    detected, the model is REBUILT (fresh device arrays + jits), the last
    periodic checkpoint is restored, the source is rewound, MIDI events
    after the checkpoint REPLAY, and the sink receives a gap-free
    duplicate-free stream identical to an uninterrupted run. The
    reference's only failure policy is assert() -> abort. (The checkpoint
    path deliberately lacks the .npz suffix numpy likes to append.)"""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.runtime.recovery import run_resilient

    rng = np.random.default_rng(21)
    x = (rng.standard_normal((2, 2, 64 * 16)) * 0.05).astype(np.float32)
    # a wet-change CC between the last checkpoint (block 4) and the crash
    # (~block 7): it must fire again on replay
    midi = lambda: MidiSchedule([(6, "", bytes([0xB0, 0x18, 32]))])

    def build():
        m = small_model(num_voices=2, engine="fmajor", num_irs=2, ir_len=128)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, wet=0x18))
        m.control.wet[:] = 0.9
        m.control.dry[:] = 0.1
        return m

    # uninterrupted baseline
    m0 = build()
    s0 = WavSink("/dev/null", keep_data=True)
    m0.process(WavSource(x, 2, 64), s0, warmup=0, midi=midi())

    class CollectSink:
        def __init__(self):
            self.blocks = []
            self.fail_at = 7
            self.failed = False

        def write(self, block):
            if not self.failed and len(self.blocks) == self.fail_at:
                self.failed = True
                raise RuntimeError("simulated poisoned readback")
            self.blocks.append(np.asarray(block))

        def close(self):
            pass

    builds = []

    def counting_build():
        builds.append(1)
        return build()

    sink = CollectSink()
    _, summary = run_resilient(
        counting_build, WavSource(x, 2, 64), sink,
        tmp_path / "resume.ckpt", checkpoint_every=4, midi=midi(),
        session_kwargs=dict(warmup=0))
    assert (tmp_path / "resume.ckpt").exists()  # no silent .npz rename
    assert summary["restarts"] == 1
    assert len(builds) == 2, "recovery must rebuild the model"
    assert summary["blocks_delivered"] == 16
    got = np.concatenate(sink.blocks, axis=-1)
    np.testing.assert_allclose(got, s0.data, atol=2e-6)


def test_resilient_session_gives_up_after_max_restarts(tmp_path):
    from tpu_audio.runtime.recovery import run_resilient

    class AlwaysFailSink:
        def write(self, block):
            raise RuntimeError("dead transport")

        def close(self):
            pass

    def build():
        return small_model(num_voices=1, engine="fmajor")

    x = np.zeros((1, 2, 64 * 4), np.float32)
    with pytest.raises(RuntimeError, match="dead transport"):
        run_resilient(build, WavSource(x, 1, 64), AlwaysFailSink(),
                      tmp_path / "r.npz", checkpoint_every=2,
                      max_restarts=2, session_kwargs=dict(warmup=0))


def test_chunked_checkpoint_interval_alignment(tmp_path):
    """Checkpoints must fire every ~N blocks even when chunk_blocks does
    not divide checkpoint_every (crossing detection, not == 0)."""
    model = small_model(num_voices=1, engine="fmajor", num_irs=2, ir_len=96)
    x = np.zeros((1, 2, 64 * 12), np.float32)
    saves = []
    import tpu_audio.runtime.checkpoint as ckpt
    orig = ckpt.save_checkpoint

    def spy(path, state, control, meta=None):
        saves.append(meta["block_index"])
        orig(path, state, control, meta=meta)

    import tpu_audio.runtime.stream as stream_mod
    session = model.session(WavSource(x, 1, 64), WavSink("/dev/null", keep_data=True),
                            warmup=0, chunk_blocks=3)
    import unittest.mock as mock
    with mock.patch.object(ckpt, "save_checkpoint", spy):
        session.run(model.init_state(), checkpoint_path=tmp_path / "c.npz",
                    checkpoint_every=4)
    # chunks land at 3,6,9,12: crossings of 4 at 6 (covers 4), 9 (8), 12
    assert saves == [6, 9, 12], saves


def test_wavsink_zero_blocks_still_writes_valid_wav(tmp_path):
    from tpu_audio.io.wav import read_wav

    sink = WavSink(tmp_path / "empty.wav", 44100)
    sink.close()
    w = read_wav(tmp_path / "empty.wav", verbose=False)
    assert w.num_frames == 0


def test_resilient_session_live_source_continues_with_gap(tmp_path):
    """Recovery with an UNSEEKABLE (live) source: the session restarts from
    the last checkpoint state, input during the outage is dropped (honest
    live semantics), and streaming continues to the end of the feed."""
    from tpu_audio.runtime.recovery import run_resilient

    class LiveishSource:  # no seek() method
        def __init__(self, n):
            self.n = n
            self.i = 0
            self.rng = np.random.default_rng(31)

        def read(self):
            if self.i >= self.n:
                return None
            self.i += 1
            return (self.rng.standard_normal((1, 2, 64)) * 0.05
                    ).astype(np.float32)

    class FlakySink:
        def __init__(self):
            self.blocks = []
            self.failed = False

        def write(self, block):
            if not self.failed and len(self.blocks) == 6:
                self.failed = True
                raise RuntimeError("transport blip")
            self.blocks.append(np.asarray(block))

        def close(self):
            pass

    def build():
        return small_model(num_voices=1, engine="fmajor", num_irs=2,
                           ir_len=96)

    sink = FlakySink()
    src = LiveishSource(20)
    _, summary = run_resilient(build, src, sink, tmp_path / "live.ckpt",
                               checkpoint_every=4,
                               session_kwargs=dict(warmup=0))
    assert summary["restarts"] == 1
    # input consumed but undelivered at the crash is gone (live gap);
    # everything the producer sent after the restart still flows
    assert src.i == 20
    assert 10 <= summary["blocks_delivered"] <= 20
    audio = np.concatenate(sink.blocks, axis=-1)
    assert np.isfinite(audio).all()


@pytest.mark.parametrize("fetch", [4, 5])
def test_fetch_batched_delivery_matches_blockwise(fetch):
    """fetch_batch > 1 (batched output transfers, per-block dispatch) must
    deliver byte-identical audio to the plain session — including a partial
    final batch — with per-block control granularity intact."""
    from tpu_audio.engine.params import CCMapping

    def build():
        m = small_model(num_voices=1, engine="fmajor", num_irs=2, ir_len=128)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
        m.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
        m.control.wet[:] = 0.9
        m.control.speed[:] = 6
        return m

    rng = np.random.default_rng(41)
    n_blocks = 14  # not a multiple of fetch: partial final batch
    x = (rng.standard_normal((1, 2, 64 * n_blocks)) * 0.05).astype(np.float32)
    midi = lambda: MidiSchedule([(5, "", bytes([0xB0, 0x15, 64]))])

    m1 = build()
    s1 = WavSink("/dev/null", keep_data=True)
    m1.process(WavSource(x, 1, 64), s1, midi=midi(), warmup=0)

    m2 = build()
    s2 = WavSink("/dev/null", keep_data=True)
    sess = m2.session(WavSource(x, 1, 64), s2, warmup=0, fetch_batch=fetch)
    sess.run(m2.init_state(), midi=midi())

    np.testing.assert_array_equal(s2.data, s1.data)
    assert sess.summary()["blocks_streamed"] == n_blocks


def test_fetch_batch_excludes_chunk_mode():
    model = small_model(num_voices=1)
    with pytest.raises(ValueError):
        model.session(SilenceSource(1, 64, 1), WavSink("/dev/null", keep_data=True),
                      chunk_blocks=2, fetch_batch=2)


def test_fetch_batched_pcm16_wire_matches_within_quantization():
    """wire='pcm16' (on-device 16-bit encode before the host transfer) must
    match the f32 path within one PCM16 LSB."""
    model = small_model(num_voices=1, engine="fmajor", num_irs=2, ir_len=96)
    model.control.wet[:] = 0.9
    rng = np.random.default_rng(43)
    x = (rng.standard_normal((1, 2, 64 * 10)) * 0.05).astype(np.float32)

    s1 = WavSink("/dev/null", keep_data=True)
    model.process(WavSource(x, 1, 64), s1, warmup=0)

    model2 = small_model(num_voices=1, engine="fmajor", num_irs=2, ir_len=96)
    model2.control.wet[:] = 0.9
    s2 = WavSink("/dev/null", keep_data=True)
    sess = model2.session(WavSource(x, 1, 64), s2, warmup=0,
                          fetch_batch=4, wire="pcm16")
    sess.run(model2.init_state())
    np.testing.assert_allclose(s2.data, s1.data, atol=1.01 / 32767.0)


def test_stale_pure_checkpoint_resume_paths_agree(tmp_path):
    """A span-collapsed mid-fade state has a STALE base tensor by design.
    Resuming such a checkpoint must work in every session mode: chunked
    sessions scan the indexed (span) step; a session with the indexed step
    disabled entirely must materialize the virtual snapshot at run start
    and serve the fade with the general step. All resumes must agree."""
    from tpu_audio.engine.params import CCMapping

    def build():
        m = small_model(num_voices=1, engine="fmajor", num_irs=2, ir_len=128)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
        m.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
        m.control.wet[:] = 0.9
        m.control.speed[:] = 30  # long fade: still in flight at checkpoint
        return m

    rng = np.random.default_rng(51)
    x = (rng.standard_normal((1, 2, 64 * 20)) * 0.05).astype(np.float32)
    midi = lambda: MidiSchedule([(2, "", bytes([0xB0, 0x15, 64]))])

    # produce a mid-fade checkpoint whose collapse went the deferred way
    m1 = build()
    sess1 = m1.session(WavSource(x[..., : 64 * 6], 1, 64),
                       WavSink("/dev/null", keep_data=True), warmup=0,
                       donate=False)
    state = sess1.run(m1.init_state(), midi=midi())
    assert getattr(sess1, "indexed_blocks", 0) >= 1
    assert bool(np.asarray(state.base_pure).all())
    assert (np.asarray(state.coef_a) > 1e-3).all(), "fade must be in flight"
    save_checkpoint(tmp_path / "pure.ckpt", state, m1.control)

    def resume(chunk, force_general=False):
        m = build()
        st, _ = load_checkpoint(tmp_path / "pure.ckpt",
                                m.engine.init_state(), m.control)
        sink = WavSink("/dev/null", keep_data=True)
        sess = m.session(WavSource(x[..., 64 * 6:], 1, 64), sink, warmup=0,
                         donate=False, chunk_blocks=chunk)
        if force_general:
            sess._step_indexed = None  # e.g. a pinned/custom step session
        sess.run(st)
        return sink.data

    got_chunked = resume(chunk=2)   # chunked span fade (scanned indexed)
    got_plain = resume(chunk=1)     # per-block span fade
    got_general = resume(chunk=1, force_general=True)  # must materialize
    np.testing.assert_allclose(got_chunked, got_plain, atol=2e-6)
    # materialized-vs-virtual snapshots agree to the bf16 snapshot scale
    np.testing.assert_allclose(got_general, got_plain, atol=4e-3)


def test_resilient_chunked_session_replays_chunk_local_midi(tmp_path):
    """Chunked-mode recovery: a CC event due INSIDE the checkpointed chunk
    (applied at the NEXT chunk start, hence not baked into the checkpoint)
    must replay after a crash — output equals the uncrashed chunked run."""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.runtime.recovery import run_resilient

    rng = np.random.default_rng(73)
    x = (rng.standard_normal((1, 2, 64 * 16)) * 0.05).astype(np.float32)
    # checkpoint_every=4, chunk=2: event at block 3 is applied at the
    # chunk start pop_due(4) — after the checkpoint at block 4 was saved
    midi = lambda: MidiSchedule([(3, "", bytes([0xB0, 0x18, 16]))])

    def build():
        m = small_model(num_voices=1, engine="fmajor", num_irs=2, ir_len=96)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, wet=0x18))
        m.control.wet[:] = 0.9
        return m

    m0 = build()
    s0 = WavSink("/dev/null", keep_data=True)
    m0.process(WavSource(x, 1, 64), s0, warmup=0, midi=midi(),
               chunk_blocks=2)

    class CrashOnce:
        def __init__(self):
            self.blocks = []
            self.failed = False

        def write(self, block):
            if not self.failed and len(self.blocks) == 5:
                self.failed = True
                raise RuntimeError("boom")
            self.blocks.append(np.asarray(block))

        def close(self):
            pass

    sink = CrashOnce()
    _, summary = run_resilient(
        build, WavSource(x, 1, 64), sink, tmp_path / "ck.ckpt",
        checkpoint_every=4, midi=midi(),
        session_kwargs=dict(warmup=0, chunk_blocks=2))
    assert summary["restarts"] == 1
    got = np.concatenate(sink.blocks, axis=-1)
    np.testing.assert_allclose(got, s0.data, atol=2e-6)


def test_session_stop_requests_clean_end():
    """session.stop() (callable from another thread, the reference's
    cin.get() park) ends an unbounded run at a block boundary."""
    import threading

    model = small_model(num_voices=1, engine="fmajor", num_irs=2, ir_len=96)

    class Endless:
        def __init__(self):
            self.i = 0

        def read(self):
            self.i += 1
            return np.zeros((1, 2, 64), np.float32)

    src = Endless()
    sink = WavSink("/dev/null", keep_data=True)
    session = model.session(src, sink, warmup=0)

    def stopper():
        while src.i < 12:
            pass
        session.stop()

    t = threading.Thread(target=stopper)
    t.start()
    session.run(model.init_state(), max_blocks=None)
    t.join()
    s = session.summary()
    assert 12 <= s["blocks_streamed"] <= 40  # ended promptly, not never


def test_fade_blocks_upload_zero_params():
    """The crossfade countdown is carried ON DEVICE: during a fade (and in
    steady state) per-block param uploads stay at zero — only real events
    re-upload. Output must equal a run that force-uploads every block."""
    from tpu_audio.engine.params import CCMapping

    def run(force_dirty):
        model = small_model(num_voices=1, num_irs=2, ir_len=128,
                            engine="fmajor", seed=3)
        model.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
        model.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
        model.control.dry[:] = 0.1
        model.control.wet[:] = 0.9
        model.control.speed[:] = 40
        n_blocks = 60
        rng = np.random.default_rng(5)
        x = (rng.standard_normal((1, 2, 64 * n_blocks)) * 0.05
             ).astype(np.float32)
        midi = MidiSchedule([(10, "", bytes([0xB0, 0x15, 64]))])
        source = WavSource(x, num_voices=1, block=64)
        sink = WavSink("/dev/null", 44100, keep_data=True)
        session = model.session(source, sink)
        uploads_at = {}
        orig_end = model.control.end_block

        def end_block():
            if force_dirty:
                model.control.mark_dirty()
            orig_end()
            uploads_at[model.control.blocks] = model.control.uploads

        model.control.end_block = end_block
        session.run(model.init_state(), max_blocks=n_blocks, midi=midi)
        return sink.data, uploads_at

    got, uploads = run(force_dirty=False)
    want, uploads_forced = run(force_dirty=True)
    np.testing.assert_array_equal(got, want)
    # forced run uploads every block; the device-countdown run uploads only
    # at startup and at the MIDI event — fading blocks add nothing
    assert uploads_forced[60] >= 59
    # allow the initial upload + the select event (+ its collapse refresh)
    assert uploads[60] <= 3, f"fade blocks re-uploaded params: {uploads}"
    # and the fade really was in flight for tens of blocks
    assert uploads[60] >= 2


def test_chunked_session_respects_max_blocks():
    """Chunked mode must not render/deliver past max_blocks: a full-chunk
    gather at the boundary used to overshoot by up to chunk-1 blocks."""
    m = small_model(num_voices=1, num_irs=2, ir_len=128)
    m.control.dry[:] = 0.2
    m.control.wet[:] = 0.8
    rng = np.random.default_rng(13)
    x = (rng.standard_normal((1, 2, 64 * 20)) * 0.05).astype(np.float32)
    sink = WavSink("/dev/null", keep_data=True)
    m.process(WavSource(x, 1, 64), sink, warmup=0, chunk_blocks=4,
              max_blocks=6)
    assert sink.data.shape[-1] == 6 * 64


def test_midischedule_parse_reports_line_and_content():
    import pytest as _pytest

    from tpu_audio.runtime.stream import MidiSchedule
    with _pytest.raises(ValueError, match=r"line 2.*B0 15 400"):
        MidiSchedule.parse("0 B0 15 40\n8 B0 15 400\n")
    with _pytest.raises(ValueError, match="line 1"):
        MidiSchedule.parse("x0 B0 15 40\n")


def test_wav_sink_all_voices_suffixless_path(tmp_path):
    sink = WavSink(tmp_path / "out", 44100, voice="all", keep_data=False)
    sink.write(np.zeros((3, 2, 16), np.float32))
    sink.close()
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["out_v000.wav", "out_v001.wav", "out_v002.wav"]


def test_wav_source_broadcast_is_lazy():
    """Shared program material must stay [1, 2, T] internally (the V-voice
    broadcast is applied per block): materializing it costs V x the file
    size in host RAM (21 GB at 1024 voices for a 60 s file)."""
    rng = np.random.default_rng(17)
    x = (rng.standard_normal((2, 64 * 3)) * 0.1).astype(np.float32)
    src = WavSource(x, num_voices=512, block=64)
    assert src.data.shape[0] == 1
    blk = src.read()
    assert blk.shape == (512, 2, 64)
    np.testing.assert_array_equal(blk[0], blk[511])
    np.testing.assert_array_equal(blk[0], x[:, :64])


def test_checkpoint_leaf_count_and_shape_mismatches_rejected(tmp_path):
    """Distinct mismatch classes fail with distinct, loud messages:
    a different ENGINE (leaf count), and the same engine at a different
    geometry (per-leaf shape) — never a silent mis-restore."""
    model = small_model(num_voices=2)
    save_checkpoint(tmp_path / "c.npz", model.init_state(), model.control)
    other_engine = small_model(num_voices=2, engine="fmajor")
    with pytest.raises(ValueError, match="state leaves"):
        load_checkpoint(tmp_path / "c.npz", other_engine.engine.init_state(),
                        other_engine.control)
    other_geom = small_model(num_voices=2, block=32)
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(tmp_path / "c.npz", other_geom.engine.init_state(),
                        other_geom.control)
