import os

import numpy as np
import pytest

from tpu_audio.app.tools import main as tools_main
from tpu_audio.io.wav import write_wav


@pytest.fixture
def bank_dir(tmp_path):
    rng = np.random.default_rng(0)
    for k in range(3):
        write_wav(tmp_path / f"ir{k}.wav",
                  rng.uniform(-0.3, 0.3, (200, 2)).astype(np.float32), 44100)
    return tmp_path


def test_tools_makeindex(bank_dir, capsys):
    idx = bank_dir / "all.index"
    assert tools_main(["makeindex", str(bank_dir), "-o", str(idx)]) == 0
    lines = idx.read_text().strip().splitlines()
    assert len(lines) == 3
    assert all(line.endswith(".wav") for line in lines)


def test_tools_makeindex_empty(tmp_path):
    assert tools_main(["makeindex", str(tmp_path)]) == 1


def test_tools_prebuild_cache_and_bank_info(bank_dir, capsys):
    idx = bank_dir / "all.index"
    tools_main(["makeindex", str(bank_dir), "-o", str(idx)])
    cache = bank_dir / "cache"
    assert tools_main(["prebuild-cache", str(idx), "--block", "64",
                       "--cache-dir", str(cache), "--quiet"]) == 0
    assert any(f.startswith("bank_") for f in os.listdir(cache))
    assert tools_main(["bank-info", str(idx), "--block", "64"]) == 0
    out = capsys.readouterr().out
    assert "3 IRs" in out


def test_tools_inspect_checkpoint(tmp_path, capsys):
    from tpu_audio.engine import ControlPlane, IRBank
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.checkpoint import save_checkpoint

    rng = np.random.default_rng(1)
    bank = IRBank()
    bank.append(rng.standard_normal((2, 100)).astype(np.float32) * 0.2)
    model = ConvolutionReverb(bank, num_voices=1, block=32, max_predelay=64)
    ckpt = tmp_path / "c.npz"
    save_checkpoint(ckpt, model.init_state(), model.control, meta={"x": 1})
    assert tools_main(["inspect-checkpoint", str(ckpt)]) == 0
    out = capsys.readouterr().out
    assert '"x": 1' in out
    assert "state_0" in out


def test_tools_profile_trace(tmp_path, capsys):
    """`tools profile` summarises a jax.profiler trace via the
    schema-free xplane reader — top events with counts and percentiles."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x @ x + 1.0

    x = jnp.ones((64, 64))
    np.asarray(f(x))
    with jax.profiler.trace(str(tmp_path)):
        for _ in range(5):
            x = f(x)
        np.asarray(x)
    assert tools_main(["profile", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "plane" in out and "total_ms" in out
    assert "Execute" in out or "PjitFunction" in out
    # a missing trace errors cleanly
    assert tools_main(["profile", str(tmp_path / "nope")]) == 2


def test_midi_fifo_transport(tmp_path):
    """Live MIDI over a FIFO reaches the control plane mid-stream."""
    from tpu_audio.runtime.midi_transport import MidiByteStream

    fifo = tmp_path / "midi.fifo"
    os.mkfifo(fifo)
    # open writer first (non-blocking reader open requires it on some systems)
    wfd = os.open(fifo, os.O_RDWR | os.O_NONBLOCK)
    stream = MidiByteStream(fifo, device="hw:9,0")
    assert stream.poll() == []
    os.write(wfd, bytes([0xB0, 21, 64, 22]))
    events = stream.poll()
    assert events == [("hw:9,0", bytes([0xB0, 21, 64]))]
    os.write(wfd, bytes([100]))  # running-status continuation across polls
    assert stream.poll() == [("hw:9,0", bytes([0xB0, 22, 100]))]
    stream.close()
    os.close(wfd)


def test_session_live_midi_and_bank_swap():
    """StreamSession: live MIDI events apply between blocks; swap_bank
    replaces the IR bank without recompiling (same geometry)."""
    import jax.numpy as jnp

    from tpu_audio.engine import ControlPlane, IRBank
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.backends import WavSink, WavSource

    rng = np.random.default_rng(2)
    bank = IRBank()
    for _ in range(2):
        ir = rng.standard_normal((2, 96)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    model = ConvolutionReverb(bank, num_voices=1, block=32, max_predelay=64)
    model.control.set_mapping(0, 0, CCMapping(message=0xB0, dry=0x17))
    model.control.set_mapping(0, 1, CCMapping(message=0xB0, dry=0x17))
    model.control.dry[:] = 0.0
    model.control.wet[:] = 1.0

    class FakeLiveMidi:
        def __init__(self):
            self.sent = False

        def poll(self):
            if not self.sent:
                self.sent = True
                return [("", bytes([0xB0, 0x17, 64]))]  # dry -> 0.5
            return []

    x = (rng.standard_normal((1, 2, 32 * 6)) * 0.05).astype(np.float32)
    session = model.session(WavSource(x, 1, 32), WavSink("/dev/null", keep_data=True),
                            warmup=0)
    state = model.init_state()
    state = session.run(state, live_midi=FakeLiveMidi())
    assert model.control.dry[0, 0] == np.float32(0.5)

    # bank swap: silence bank -> output decays to dry-only
    silent = IRBank()
    for _ in range(2):
        silent.append(np.zeros((2, 96), np.float32))
    new_spectra = model.engine.prepare_bank(silent.partitioned_spectra(32, 3))
    session.swap_bank(new_spectra)
    sink2 = WavSink("/dev/null", keep_data=True)
    session.sink = sink2
    session.source = WavSource(x, 1, 32)
    session.run(state)
    # with a silent bank and the engine converged, wet == 0: only the 2x2
    # dry mix remains (both inputs into both outputs, conv.cu:126-140)
    got = sink2.data
    want_dry = (x[0, 0] + x[0, 1]) * 0.5
    start = 96 + 64  # after old wet tail + max predelay flushes
    for o in range(2):
        np.testing.assert_allclose(got[0, o, start:], want_dry[start:],
                                   atol=2e-3)


def test_multi_midi_fifo_routes_by_device(tmp_path):
    """Two FIFO devices drive DIFFERENT voices of one session, routed by
    CCMapping.device (the reference's one-reader-per-ALSA-device model,
    src/main.cu:47-48) — here through MultiMidiStream in a live session."""
    from tpu_audio.engine import IRBank
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.midi_transport import MidiByteStream, MultiMidiStream

    fifos, wfds, streams = [], [], []
    for i, dev in enumerate(["hw:1,0", "hw:2,0"]):
        path = tmp_path / f"midi{i}.fifo"
        os.mkfifo(path)
        wfds.append(os.open(path, os.O_RDWR | os.O_NONBLOCK))
        streams.append(MidiByteStream(path, device=dev))
        fifos.append(path)
    multi = MultiMidiStream(streams)

    rng = np.random.default_rng(3)
    bank = IRBank()
    for _ in range(2):
        ir = rng.standard_normal((2, 96)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    model = ConvolutionReverb(bank, num_voices=2, block=32, max_predelay=64)
    # voice 0 listens on device hw:1,0, voice 1 on hw:2,0 — same CC number
    for ch in range(2):
        model.control.set_mapping(0, ch, CCMapping(device="hw:1,0",
                                                   message=0xB0, dry=0x17))
        model.control.set_mapping(1, ch, CCMapping(device="hw:2,0",
                                                   message=0xB0, dry=0x17))
    model.control.dry[:] = 0.0

    os.write(wfds[0], bytes([0xB0, 0x17, 64]))    # hw:1,0 -> dry 0.5
    os.write(wfds[1], bytes([0xB0, 0x17, 127]))   # hw:2,0 -> dry ~0.99

    x = (rng.standard_normal((2, 2, 32 * 4)) * 0.05).astype(np.float32)
    session = model.session(WavSource(x, 2, 32),
                            WavSink("/dev/null", keep_data=True), warmup=0)
    session.run(model.init_state(), live_midi=multi)

    assert model.control.dry[0, 0] == np.float32(64 / 128.0)
    assert model.control.dry[1, 0] == np.float32(127 / 128.0)
    multi.close()
    for fd in wfds:
        os.close(fd)


def test_cli_midi_fifo_device_spec_parsing():
    """--midi-fifo accepts repeatable [DEVICE=]PATH specs."""
    from tpu_audio.app.main import build_parser

    args = build_parser().parse_args(
        ["--midi-fifo", "hw:2,0=/tmp/a.fifo", "--midi-fifo", "/tmp/b.fifo"])
    specs = []
    for spec in args.midi_fifo:
        device, _, path = spec.rpartition("=")
        specs.append((device, path))
    assert specs == [("hw:2,0", "/tmp/a.fifo"), ("", "/tmp/b.fifo")]


def test_alsa_rawmidi_path_convention(tmp_path):
    """'hw:C,D' ids map to /dev/snd char devices (reference src/main.cu:47
    settings convention); reading one is just MidiByteStream on a path."""
    from tpu_audio.runtime.midi_transport import (
        MidiByteStream, alsa_rawmidi_path, list_alsa_rawmidi,
        open_alsa_rawmidi)

    assert alsa_rawmidi_path("hw:2,0") == "/dev/snd/midiC2D0"
    assert alsa_rawmidi_path("hw:11,3") == "/dev/snd/midiC11D3"
    assert alsa_rawmidi_path("hw:1") == "/dev/snd/midiC1D0"
    assert alsa_rawmidi_path("/custom/dev") == "/custom/dev"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        alsa_rawmidi_path("usb:1")
    # discovery over a fake /dev/snd
    (tmp_path / "midiC0D0").write_bytes(b"")
    (tmp_path / "midiC2D1").write_bytes(b"")
    (tmp_path / "pcmC0D0p").write_bytes(b"")
    assert list_alsa_rawmidi(str(tmp_path)) == ["hw:0,0", "hw:2,1"]
    assert list_alsa_rawmidi(str(tmp_path / "missing")) == []
    # framing through a (fake) device file — same path as a real one
    dev = tmp_path / "midiC9D0"
    dev.write_bytes(bytes([0xB0, 0x15, 0x40, 0x16, 0x7F]))  # running status
    stream = MidiByteStream(str(dev), device="hw:9,0")
    events = stream.poll()
    stream.close()
    assert events == [("hw:9,0", bytes([0xB0, 0x15, 0x40])),
                      ("hw:9,0", bytes([0xB0, 0x16, 0x7F]))]


def test_jack_bridge_gating():
    """The JACK bridge must degrade gracefully where libjack is absent
    (this CI host) and expose its availability probe."""
    from tpu_audio.runtime.jack_bridge import JackRingBridge, jack_available

    if jack_available():  # pragma: no cover - host-dependent
        import pytest as _pytest
        _pytest.skip("libjack present; bridge needs a running jackd")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="libjack"):
        JackRingBridge(None, None)


def test_jack_bridge_process_callback_logic():
    """Drive JackRingBridge._process with a stub libjack: capture ->
    input ring, output ring -> playback with silence substitution on
    underrun, drop-newest + overrun count on input-ring overflow."""
    import ctypes

    import numpy as np

    from tpu_audio.runtime.jack_bridge import JackRingBridge

    frames = 8

    class FakeLib:
        def __init__(self):
            # one f32 buffer per port handle
            self.buffers = {h: np.zeros(frames, np.float32)
                            for h in (1, 2, 3, 4)}

        def jack_port_get_buffer(self, port, nframes):
            return self.buffers[port].ctypes.data_as(
                ctypes.POINTER(ctypes.c_float))

    class FakeRing:
        def __init__(self, accept=True):
            self.accept = accept
            self.written = []
            self.queue = []

        def write(self, data):
            if not self.accept:
                return False
            self.written.append(np.array(data))
            return True

        def read(self, n):
            return self.queue.pop(0) if self.queue else None

    bridge = JackRingBridge.__new__(JackRingBridge)  # skip jackd handshake
    bridge.lib = FakeLib()
    bridge.in_ring = FakeRing()
    bridge.out_ring = FakeRing()
    bridge.ports_in = [1, 2]
    bridge.ports_out = [3, 4]
    bridge.underruns = 0
    bridge.overruns = 0

    bridge.lib.buffers[1][:] = 0.25         # L capture
    bridge.lib.buffers[2][:] = -0.5         # R capture
    out = np.concatenate([np.full(frames, 0.125, np.float32),
                          np.full(frames, -0.25, np.float32)])
    bridge.out_ring.queue.append(out)

    assert bridge._process(frames, None) == 0
    # capture landed planar [L..., R...] in the input ring
    got = bridge.in_ring.written[0].reshape(2, frames)
    np.testing.assert_array_equal(got[0], 0.25)
    np.testing.assert_array_equal(got[1], -0.5)
    # playback buffers carry the ring audio
    np.testing.assert_array_equal(bridge.lib.buffers[3], 0.125)
    np.testing.assert_array_equal(bridge.lib.buffers[4], -0.25)
    assert bridge.underruns == 0 and bridge.overruns == 0

    # dry output ring -> silence + underrun count
    assert bridge._process(frames, None) == 0
    np.testing.assert_array_equal(bridge.lib.buffers[3], 0.0)
    assert bridge.underruns == 1

    # full input ring -> period dropped whole, overrun counted
    bridge.in_ring.accept = False
    assert bridge._process(frames, None) == 0
    assert bridge.overruns == 1
    assert len(bridge.in_ring.written) == 2  # nothing new appended


def test_jack_bridge_connects_settings_ports():
    """start() wires the conv[n].input/output external ports from
    settings like the reference (src/main.cu:86-89), falling back to
    system capture/playback when unset."""
    from tpu_audio.io.settings import Settings
    from tpu_audio.runtime.jack_bridge import (JackRingBridge,
                                               ports_from_settings)

    s = Settings().parse(
        "conv[0].input mic:left\n"
        "conv[0].output speakers:left\n"
        "conv[1].input mic:right\n"
        "conv[1].output speakers:right\n", verbose=False)
    ins, outs = ports_from_settings(s)
    assert ins == ["mic:left", "mic:right"]
    assert outs == ["speakers:left", "speakers:right"]
    # missing keys fall back to the reference's own settings.txt wiring
    ins2, outs2 = ports_from_settings(Settings())
    assert ins2 == ["system:capture_1", "system:capture_2"]
    assert outs2 == ["system:playback_1", "system:playback_2"]

    class FakeLib:
        def __init__(self):
            self.connected = []

        def jack_activate(self, client):
            return 0

        def jack_connect(self, client, src, dst):
            self.connected.append((src.decode(), dst.decode()))
            return 0

    bridge = JackRingBridge.__new__(JackRingBridge)  # skip jackd handshake
    bridge.lib = FakeLib()
    bridge.client = object()
    bridge.name = "tpu_audio"
    bridge.connect_inputs = ins
    bridge.connect_outputs = outs
    bridge.start()
    assert bridge.lib.connected == [
        ("mic:left", "tpu_audio:in_0"),
        ("tpu_audio:out_0", "speakers:left"),
        ("mic:right", "tpu_audio:in_1"),
        ("tpu_audio:out_1", "speakers:right"),
    ]


def test_midi_byte_stream_from_fd_and_read_error():
    """MidiByteStream accepts a raw fd (ALSA rawmidi opened elsewhere);
    a transport read error logs a warning and returns what was framed,
    never raising into the audio loop."""
    import os

    from tpu_audio.runtime.midi_transport import MidiByteStream

    r, w = os.pipe()
    stream = MidiByteStream(r, device="fd")
    os.write(w, bytes([0xB0, 0x15, 0x40]))
    events = stream.poll()
    assert events == [("fd", bytes([0xB0, 0x15, 0x40]))]
    os.close(w)
    os.close(r)                      # poisoned fd: read raises OSError
    assert stream.poll() == []       # warned, not raised


def test_resolve_index_joins_root(tmp_path):
    """conv[n].index paths resolve against --root when not found as-is
    (reference indices are repo-root-relative, src/main.cu:72)."""
    from tpu_audio.io.settings import Settings
    from tpu_audio.models.reverb import _resolve_index

    (tmp_path / "ir").mkdir()
    (tmp_path / "ir" / "all.index").write_text("1\nx.wav\n")
    s = Settings()
    s["conv[0].index"] = "ir/all.index"
    got = _resolve_index(s, 0, str(tmp_path))
    assert got == str(tmp_path / "ir" / "all.index")
    # found as-is: returned untouched; missing everywhere: passthrough
    s["conv[1].index"] = str(tmp_path / "ir" / "all.index")
    assert _resolve_index(s, 1, str(tmp_path)) == str(
        tmp_path / "ir" / "all.index")
    s["conv[2].index"] = "nowhere/else.index"
    assert _resolve_index(s, 2, str(tmp_path)) == "nowhere/else.index"
