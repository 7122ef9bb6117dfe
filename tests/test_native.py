import numpy as np
import pytest

from tpu_audio.runtime import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")


def test_ring_roundtrip():
    ring = native.NativeRing(1024)
    x = np.arange(256, dtype=np.float32)
    assert ring.write(x)
    assert ring.readable == 256
    got = ring.read(256)
    np.testing.assert_array_equal(got, x)
    assert ring.read(1) is None
    ring.close()


def test_ring_wraparound():
    ring = native.NativeRing(100)
    for rep in range(10):
        x = np.full(60, float(rep), np.float32)
        assert ring.write(x)
        got = ring.read(60)
        np.testing.assert_array_equal(got, x)
    ring.close()


def test_ring_all_or_none():
    ring = native.NativeRing(100)
    assert ring.write(np.zeros(90, np.float32))
    assert not ring.write(np.zeros(20, np.float32))  # would overflow
    assert ring.read(100) is None                    # not enough data
    assert ring.read(90) is not None
    ring.close()


def test_ring_shared_memory_cross_handle():
    name = f"/tpuaudio_test_{np.random.randint(1e9)}"
    a = native.NativeRing(512, shm_name=name)
    b = native.NativeRing.open(name)
    x = np.random.default_rng(0).standard_normal(128).astype(np.float32)
    assert a.write(x)
    np.testing.assert_array_equal(b.read(128), x)
    b.close()
    a.close(unlink=True)


def test_block_clock_paces_and_counts():
    import time
    clock = native.NativeBlockClock(0.002)
    t0 = time.perf_counter()
    for _ in range(10):
        late = clock.wait()
    elapsed = time.perf_counter() - t0
    assert elapsed >= 0.018  # ~10 x 2ms
    assert clock.ticks == 10
    # force a miss
    time.sleep(0.01)
    late = clock.wait()
    assert late > 0
    assert clock.missed >= 1
    clock.close()


def test_native_midi_framer_matches_python():
    """The C framer must be bit-compatible with the Python framer across a
    randomized stream of valid messages, running status, realtime bytes,
    SysEx, and noise."""
    from tpu_audio.io.midi import MidiFramer

    rng = np.random.default_rng(1)
    stream = bytearray()
    for _ in range(200):
        kind = rng.integers(0, 6)
        if kind == 0:
            stream += bytes([0xB0 | rng.integers(0, 16),
                             rng.integers(0, 128), rng.integers(0, 128)])
        elif kind == 1:  # running status continuation
            stream += bytes([rng.integers(0, 128), rng.integers(0, 128)])
        elif kind == 2:
            stream += bytes([0x90, rng.integers(0, 128), rng.integers(0, 128)])
        elif kind == 3:
            stream += bytes([0xF8])  # clock
        elif kind == 4:
            stream += bytes([0xC0, rng.integers(0, 128)])
        else:
            stream += bytes([0xF0, 1, 2, 3, 0xF7])
    py = MidiFramer()
    nat = native.NativeMidiFramer()
    # feed in randomly-sized chunks to exercise partial-message state
    py_msgs, nat_msgs = [], []
    i = 0
    while i < len(stream):
        n = int(rng.integers(1, 9))
        chunk = bytes(stream[i:i + n])
        py_msgs += py.feed(chunk)
        nat_msgs += nat.feed(chunk)
        i += n
    assert py_msgs == nat_msgs
    assert len(py_msgs) > 100
    nat.close()


def test_ring_source_sink_block_adapters():
    ring = native.NativeRing(8192)
    sink = native.RingSink(ring)
    src = native.RingSource(ring, num_voices=2, block=32)
    block = np.random.default_rng(2).standard_normal((2, 2, 32)).astype(np.float32)
    sink.write(block)
    got = src.read()
    np.testing.assert_array_equal(got, block)
    assert src.read() is None  # non-blocking empty
    ring.close()


def test_native_framer_running_status_flood_loses_nothing():
    """A 4096-byte running-status CC flood expands ~2x in framed form;
    the binding must size the out buffer to the 3n+260 worst case (the
    old fixed 4096 silently dropped half the messages)."""
    from tpu_audio.io.midi import MidiFramer

    stream = bytes([0xB0]) + bytes(
        int(b) for p in range(2047) for b in (p % 120, (p * 7) % 128))
    nat = native.NativeMidiFramer()
    got = nat.feed(stream)
    want = MidiFramer().feed(stream)
    assert len(got) == len(want) == 2047
    assert got == want
    nat.close()


def test_native_framer_system_common_matches_python():
    from tpu_audio.io.midi import MidiFramer

    stream = bytes([0xB0, 0x15, 0x40, 0xF1, 0x05, 0x16, 0x41,
                    0xB0, 0x17, 0x42, 0xF2, 0x01, 0x02, 0xF6,
                    0xF0, 0x01, 0xF7, 0x10, 0x20,
                    0x90, 0x40, 0x7F])
    nat = native.NativeMidiFramer()
    assert nat.feed(stream) == MidiFramer().feed(stream)
    nat.close()


# ---------------------------------------------------------------------------
# native C JACK bridge (csrc/jackbridge.cpp) driven end-to-end against the
# deterministic stub jackd (csrc/jackstub.cpp) via TPU_AUDIO_LIBJACK


def _build_jack_stub(tmp_path):
    import os
    import subprocess
    csrc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc")
    so = str(tmp_path / "libjackstub.so")
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-std=c++17", "-shared",
         os.path.join(csrc, "jackstub.cpp"), "-o", so, "-lpthread"],
        check=True, capture_output=True, timeout=120)
    return so


def test_native_jack_bridge_end_to_end(tmp_path):
    """Run the C bridge binary against the stub jackd: capture pattern
    lands planar in the input ring, pre-queued output-ring audio reaches
    the playback ports, jack_connect wires the reference port names, and
    the underrun counter reflects the dry tail."""
    import os
    import re
    import subprocess

    exe = native.bridge_path()
    assert exe, "bridge build failed"
    stub = _build_jack_stub(tmp_path)

    block, periods = 64, 6
    tag = np.random.randint(1e9)
    in_name, out_name = f"/tajb_in_{tag}", f"/tajb_out_{tag}"
    in_ring = native.NativeRing(2 * block * (periods + 2), shm_name=in_name)
    out_ring = native.NativeRing(2 * block * (periods + 2), shm_name=out_name)
    # pre-queue playback audio for the first 4 periods; the last 2 underrun
    queued = []
    for p in range(4):
        blk = np.concatenate([np.full(block, 1.0 + p, np.float32),
                              np.full(block, -1.0 - p, np.float32)])
        queued.append(blk)
        assert out_ring.write(blk)

    connect_log = tmp_path / "connects.txt"
    dump = tmp_path / "playback.f32"
    env = dict(os.environ,
               TPU_AUDIO_LIBJACK=stub,
               JACK_STUB_BLOCK=str(block),
               JACK_STUB_PERIODS=str(periods),
               JACK_STUB_PERIOD_US="2000",
               JACK_STUB_CONNECT_LOG=str(connect_log),
               JACK_STUB_DUMP=str(dump),
               JACK_STUB_ASSIGNED_NAME="tpu_audio-01",  # server rename
               JACK_STUB_RAISE_ON_DONE="1")
    proc = subprocess.run(
        [exe, "--in-ring", in_name, "--out-ring", out_name,
         "--expect-block", str(block), "--max-seconds", "10",
         "--connect-in", "mic:left", "--connect-in", "mic:right",
         "--connect-out", "spk:left", "--connect-out", "spk:right"],
        env=env, capture_output=True, text=True, timeout=60)
    try:
        assert proc.returncode == 0, proc.stderr
        stats = re.search(r"periods=(\d+) underruns=(\d+) overruns=(\d+)",
                          proc.stdout)
        assert stats, proc.stdout
        assert int(stats.group(1)) == periods
        assert int(stats.group(2)) == periods - 4  # 2 dry periods
        assert int(stats.group(3)) == 0

        # capture -> input ring: planar [L..., R...] per period, the stub's
        # exact pattern (0.25+p / -0.5-p)
        for p in range(periods):
            got = in_ring.read(2 * block)
            assert got is not None, f"period {p} missing from input ring"
            got = got.reshape(2, block)
            np.testing.assert_array_equal(got[0], np.float32(0.25 + p))
            np.testing.assert_array_equal(got[1], np.float32(-0.5 - p))
        assert in_ring.read(1) is None  # nothing extra

        # output ring -> playback ports: queued blocks verbatim, then silence
        played = np.fromfile(dump, np.float32).reshape(periods, 2 * block)
        for p in range(4):
            np.testing.assert_array_equal(played[p], queued[p])
        np.testing.assert_array_equal(played[4:], 0.0)

        # reference wiring under the ASSIGNED client name (main.cu:86-89)
        lines = connect_log.read_text().strip().splitlines()
        assert lines == [
            "mic:left -> tpu_audio-01:in_0",
            "tpu_audio-01:out_0 -> spk:left",
            "mic:right -> tpu_audio-01:in_1",
            "tpu_audio-01:out_1 -> spk:right",
        ]
    finally:
        in_ring.close(unlink=True)
        out_ring.close(unlink=True)


def test_native_jack_bridge_block_mismatch_refuses(tmp_path):
    """--expect-block != jackd's period must exit nonzero with the
    channel-garbling explanation (same contract as the Python bridge)."""
    import os
    import subprocess

    exe = native.bridge_path()
    assert exe, "bridge build failed"
    stub = _build_jack_stub(tmp_path)
    tag = np.random.randint(1e9)
    in_name, out_name = f"/tajbm_in_{tag}", f"/tajbm_out_{tag}"
    in_ring = native.NativeRing(1024, shm_name=in_name)
    out_ring = native.NativeRing(1024, shm_name=out_name)
    try:
        env = dict(os.environ, TPU_AUDIO_LIBJACK=stub, JACK_STUB_BLOCK="128")
        proc = subprocess.run(
            [exe, "--in-ring", in_name, "--out-ring", out_name,
             "--expect-block", "256", "--max-seconds", "1"],
            env=env, capture_output=True, text=True, timeout=30)
        assert proc.returncode == 6
        assert "garbles" in proc.stderr
    finally:
        in_ring.close(unlink=True)
        out_ring.close(unlink=True)


def test_native_jack_bridge_rate_mismatch_refuses(tmp_path):
    """--expect-rate != jackd's sample rate must exit nonzero with the
    pitch-shift explanation (a rate mismatch streams pitch-shifted audio
    with no other symptom; the reference reads the server's rate at
    jackclient.cu:39)."""
    import os
    import subprocess

    exe = native.bridge_path()
    assert exe, "bridge build failed"
    stub = _build_jack_stub(tmp_path)
    tag = np.random.randint(1e9)
    in_name, out_name = f"/tajbr_in_{tag}", f"/tajbr_out_{tag}"
    in_ring = native.NativeRing(1024, shm_name=in_name)
    out_ring = native.NativeRing(1024, shm_name=out_name)
    try:
        env = dict(os.environ, TPU_AUDIO_LIBJACK=stub,
                   JACK_STUB_RATE="48000")
        proc = subprocess.run(
            [exe, "--in-ring", in_name, "--out-ring", out_name,
             "--expect-rate", "44100", "--max-seconds", "1"],
            env=env, capture_output=True, text=True, timeout=30)
        assert proc.returncode == 6
        assert "pitch-shifted" in proc.stderr
        assert "-r44100" in proc.stderr          # the restart hint
    finally:
        in_ring.close(unlink=True)
        out_ring.close(unlink=True)


def test_native_jack_bridge_rejects_extra_connect_ports():
    """A third --connect-in must error like the Python launcher does —
    it used to be silently discarded (only the first two were wired)."""
    import subprocess

    exe = native.bridge_path()
    assert exe, "bridge build failed"
    proc = subprocess.run(
        [exe, "--in-ring", "a", "--out-ring", "b",
         "--connect-in", "x", "--connect-in", "y", "--connect-in", "z"],
        capture_output=True, text=True, timeout=30)
    assert proc.returncode == 2
    assert "exactly twice" in proc.stderr


def test_native_launcher_execs_c_bridge(tmp_path):
    """jack_bridge.py --native resolves ports from settings and execs the
    C binary (one process end to end, reference main.cu:86-89 wiring)."""
    import os
    import subprocess
    import sys

    stub = _build_jack_stub(tmp_path)
    tag = np.random.randint(1e9)
    in_name, out_name = f"/tajl_in_{tag}", f"/tajl_out_{tag}"
    in_ring = native.NativeRing(4096, shm_name=in_name)
    out_ring = native.NativeRing(4096, shm_name=out_name)
    settings = tmp_path / "settings.txt"
    settings.write_text("conv[0].input mic:l\nconv[0].output spk:l\n"
                        "conv[1].input mic:r\nconv[1].output spk:r\n")
    connect_log = tmp_path / "connects.txt"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               TPU_AUDIO_LIBJACK=stub,
               JACK_STUB_BLOCK="256", JACK_STUB_PERIODS="2",
               JACK_STUB_RAISE_ON_DONE="1",
               JACK_STUB_CONNECT_LOG=str(connect_log),
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "tpu_audio.runtime.jack_bridge",
             "--native", "--in-ring", in_name, "--out-ring", out_name,
             "--settings", str(settings), "--expect-block", "256"],
            env=env, capture_output=True, text=True, timeout=60)
        assert proc.returncode == 0, proc.stderr
        assert "periods=2" in proc.stdout
        assert connect_log.read_text().splitlines() == [
            "mic:l -> tpu_audio:in_0",
            "tpu_audio:out_0 -> spk:l",
            "mic:r -> tpu_audio:in_1",
            "tpu_audio:out_1 -> spk:r",
        ]
    finally:
        in_ring.close(unlink=True)
        out_ring.close(unlink=True)


# ---------------------------------------------------------------------------
# ctypes JACK bridge (runtime/jack_bridge.py) driven IN-PROCESS against the
# same stub jackd: TPU_AUDIO_LIBJACK overrides discovery exactly like the
# C bridge, so the Python bridge is testable (and deployable against
# non-standard libjack paths) without a real JACK install.


def _fresh_jack(monkeypatch, stub, **env):
    from tpu_audio.runtime import jack_bridge as jb

    monkeypatch.setenv("TPU_AUDIO_LIBJACK", stub)
    for k, v in env.items():
        monkeypatch.setenv(k, str(v))
    monkeypatch.setattr(jb, "_LIB", None)
    monkeypatch.setattr(jb, "_LIB_TRIED", False)
    assert jb.jack_available()
    return jb


def test_ctypes_jack_bridge_end_to_end(tmp_path, monkeypatch):
    """JackRingBridge against the stub jackd, in-process: the capture
    pattern lands planar in the input ring, pre-queued output audio
    reaches the playback ports (then silence + underrun counts), and
    jack_connect wires the server-ASSIGNED client name."""
    import time

    stub = _build_jack_stub(tmp_path)
    block, periods = 64, 5
    dump = tmp_path / "dump.f32"
    clog = tmp_path / "connect.log"
    jb = _fresh_jack(monkeypatch, stub,
                     JACK_STUB_BLOCK=block, JACK_STUB_PERIODS=periods,
                     JACK_STUB_PERIOD_US=2000,
                     JACK_STUB_DUMP=dump, JACK_STUB_CONNECT_LOG=clog,
                     JACK_STUB_ASSIGNED_NAME="tpu_audio-01")
    in_ring = native.NativeRing(2 * block * (periods + 2))
    out_ring = native.NativeRing(2 * block * (periods + 2))
    # pre-queue 2 periods of output; the remaining 3 underrun to silence
    queued = [np.concatenate([np.full(block, 0.5 + p, np.float32),
                              np.full(block, -1.0 - p, np.float32)])
              for p in range(2)]
    for q in queued:
        assert out_ring.write(q)

    bridge = jb.JackRingBridge(in_ring, out_ring, expect_block=block,
                               connect_inputs=["ext:cap_1", "ext:cap_2"],
                               connect_outputs=["ext:play_1", "ext:play_2"])
    assert bridge.name == "tpu_audio-01"    # server-assigned, not requested
    bridge.start()
    deadline = time.time() + 10
    while in_ring.readable < 2 * block * periods and time.time() < deadline:
        time.sleep(0.01)
    bridge.stop()

    # capture pattern, planar per period: in_0 = 0.25+p, in_1 = -0.5-p
    for p in range(periods):
        got = in_ring.read(2 * block).reshape(2, block)
        np.testing.assert_array_equal(got[0], np.float32(0.25 + p))
        np.testing.assert_array_equal(got[1], np.float32(-0.5 - p))
    assert bridge.underruns == periods - 2 and bridge.overruns == 0

    # playback dump: the queued audio first, then silence
    played = np.fromfile(dump, np.float32).reshape(periods, 2, block)
    np.testing.assert_array_equal(played[0].ravel(), queued[0])
    np.testing.assert_array_equal(played[1].ravel(), queued[1])
    np.testing.assert_array_equal(played[2:], 0.0)

    # reference wiring through the ASSIGNED name (src/main.cu:86-89)
    lines = clog.read_text().strip().splitlines()
    assert "ext:cap_1 -> tpu_audio-01:in_0" in lines
    assert "tpu_audio-01:out_1 -> ext:play_2" in lines
    in_ring.close()
    out_ring.close()


def test_ctypes_jack_bridge_block_mismatch_refuses(tmp_path, monkeypatch):
    """A jackd period != the session block garbles unframed rings; the
    bridge must refuse loudly at construction."""
    stub = _build_jack_stub(tmp_path)
    jb = _fresh_jack(monkeypatch, stub, JACK_STUB_BLOCK=128)
    in_ring = native.NativeRing(1024)
    out_ring = native.NativeRing(1024)
    with pytest.raises(RuntimeError, match="128 frames/period"):
        jb.JackRingBridge(in_ring, out_ring, expect_block=64)
    in_ring.close()
    out_ring.close()


def test_ctypes_jack_bridge_rate_mismatch_refuses(tmp_path, monkeypatch):
    """A jackd at 48 kHz feeding a 44.1 kHz session streams pitch-shifted
    audio with no other symptom; the bridge must refuse loudly at
    construction (same contract as the block check)."""
    stub = _build_jack_stub(tmp_path)
    jb = _fresh_jack(monkeypatch, stub, JACK_STUB_RATE=48000)
    in_ring = native.NativeRing(1024)
    out_ring = native.NativeRing(1024)
    with pytest.raises(RuntimeError, match="pitch-shifted"):
        jb.JackRingBridge(in_ring, out_ring, expect_rate=44100)
    in_ring.close()
    out_ring.close()
