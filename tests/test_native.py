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
