import glob
import os

import numpy as np
import pytest

from tpu_audio.io.wav import read_wav, write_wav


def test_write_read_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(0)
    frames = (rng.uniform(-0.9, 0.9, size=(1000, 2))).astype(np.float32)
    p = tmp_path / "t16.wav"
    write_wav(p, frames, 44100, bits=16, scale="full")
    w = read_wav(p, scale="full", verbose=False)
    assert w.sample_rate == 44100
    assert w.num_channels == 2
    assert w.num_frames == 1000
    np.testing.assert_allclose(w.frames, frames, atol=1.0 / 32768)


def test_write_read_roundtrip_24bit(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.uniform(-0.9, 0.9, size=(777, 2)).astype(np.float32)
    p = tmp_path / "t24.wav"
    write_wav(p, frames, 48000, bits=24, scale="full")
    w = read_wav(p, scale="full", verbose=False)
    np.testing.assert_allclose(w.frames, frames, atol=1.0 / 8388608)


def test_write_read_roundtrip_float32(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.uniform(-1, 1, size=(333, 1)).astype(np.float32)
    p = tmp_path / "tf32.wav"
    write_wav(p, frames, 44100, bits=32, scale="full")
    w = read_wav(p, scale="full", verbose=False)
    np.testing.assert_allclose(w.frames, frames, atol=0)
    assert w.num_channels == 1


def test_reference_scaling_16bit(tmp_path):
    """Reference scale divides 16-bit PCM by 65536 (src/wav.cu:13): full-scale
    positive (32767) maps to just under 0.5."""
    import struct
    pcm = np.array([[32767, -32768], [16384, -16384]], dtype="<i2")
    payload = pcm.tobytes()
    p = tmp_path / "ref16.wav"
    with open(p, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16))
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)
    w = read_wav(p, scale="reference", verbose=False)
    np.testing.assert_allclose(
        w.frames,
        np.array([[32767, -32768], [16384, -16384]], np.float32) / 65536.0,
        rtol=0, atol=0,
    )


def test_reference_scaling_24bit(tmp_path):
    """Reference scale: sign-extended 24-bit value / 2^24 (src/wav.cu:27-41)."""
    import struct
    vals = np.array([8388607, -8388608, 1, -1], dtype=np.int64)
    u = vals.astype(np.uint32) & 0xFFFFFF
    b = np.empty((4, 3), np.uint8)
    b[:, 0] = u & 0xFF
    b[:, 1] = (u >> 8) & 0xFF
    b[:, 2] = (u >> 16) & 0xFF
    payload = b.tobytes()
    p = tmp_path / "ref24.wav"
    with open(p, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 6, 6, 24))
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)
    w = read_wav(p, scale="reference", verbose=False)
    np.testing.assert_allclose(
        w.frames.reshape(-1), vals.astype(np.float32) / 16777216.0, rtol=0, atol=0)


def test_extra_chunks_are_skipped(tmp_path):
    """RIFF files with LIST/INFO chunks between fmt and data must parse."""
    import struct
    pcm = np.zeros(10, dtype="<i2")
    payload = pcm.tobytes()
    p = tmp_path / "chunky.wav"
    junk = b"JUNKDATA"
    with open(p, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 0) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16))
        fh.write(b"LIST" + struct.pack("<I", len(junk)) + junk)
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)
    w = read_wav(p, verbose=False)
    assert w.num_frames == 10


REFERENCE_IRS = sorted(glob.glob("/root/reference/ir/1/*.wav"))[:3] + \
    sorted(glob.glob("/root/reference/ir/2/**/*.wav", recursive=True))[:3]


@pytest.mark.parametrize("path", REFERENCE_IRS or ["missing"])
def test_reference_ir_files_load(path):
    if not os.path.exists(path):
        pytest.skip("reference IRs not mounted")
    w = read_wav(path, verbose=False)
    assert w.num_channels == 2
    assert w.sample_rate in (44100, 48000, 96000)
    assert w.num_frames > 1000
    assert np.all(np.isfinite(w.frames))
    # reference scaling keeps everything within +-0.5 full scale
    assert np.max(np.abs(w.frames)) <= 0.5


def test_ieee_float64_wav_reads_correctly(tmp_path):
    """A double-precision float WAV (producible by sox/librosa) must honour
    bits-per-sample — parsing f64 samples as f4 halves loaded the IR as
    noise at twice the frame count, silently."""
    import struct

    frames = np.linspace(-0.5, 0.5, 32, dtype=np.float64)[:, None]
    frames = np.repeat(frames, 2, axis=1)
    payload = frames.astype("<f8").tobytes()
    p = tmp_path / "f64.wav"
    with open(p, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 44100,
                                       44100 * 16, 16, 64))
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)
    w = read_wav(p, scale="full", verbose=False)
    assert w.num_frames == 32
    np.testing.assert_allclose(w.frames, frames.astype(np.float32),
                               atol=1e-7)


def _wav_bytes(fmt_tag, channels, bits, payload, fmt_extra=b""):
    import struct
    body = struct.pack("<HHIIHH", fmt_tag, channels, 44100,
                       44100 * channels * max(bits // 8, 1),
                       channels * max(bits // 8, 1), bits) + fmt_extra
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + len(payload))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(body)) + body
            + b"data" + struct.pack("<I", len(payload)) + payload)


def test_pcm8_decode_and_helpers(tmp_path):
    """8-bit PCM is unsigned-biased at 128 (wav spec); WavFile.stereo()
    duplicates mono and truncates >2ch; duration_s is frames/rate."""
    payload = bytes([0, 128, 255])
    p = tmp_path / "u8.wav"
    p.write_bytes(_wav_bytes(1, 1, 8, payload))
    w = read_wav(p, scale="full", verbose=False)
    np.testing.assert_allclose(
        w.frames.reshape(-1), [(0 - 128) / 128, 0.0, 127 / 128], atol=0)
    assert w.duration_s == 3 / 44100
    st = w.stereo()
    assert st.shape == (3, 2)
    np.testing.assert_array_equal(st[:, 0], st[:, 1])
    # >2 channels truncate
    quad = np.zeros((5, 4), "<i2").tobytes()
    p4 = tmp_path / "quad.wav"
    p4.write_bytes(_wav_bytes(1, 4, 16, quad))
    assert read_wav(p4, verbose=False).stereo().shape == (5, 2)


def test_wave_format_extensible_resolves_subformat(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries the true format in the
    SubFormat GUID's first two bytes (pro-audio tools emit this for
    >16-bit or >2ch files)."""
    import struct
    pcm = np.array([1000, -1000], "<i2").tobytes()
    # cbSize(2) + validBits(2) + channelMask(4) + GUID (PCM = 1 first)
    extra = struct.pack("<HHI", 22, 16, 0) + struct.pack("<H", 1) + b"\0" * 14
    p = tmp_path / "ext.wav"
    p.write_bytes(_wav_bytes(0xFFFE, 1, 16, pcm, fmt_extra=extra))
    w = read_wav(p, scale="full", verbose=False)
    np.testing.assert_allclose(w.frames.reshape(-1),
                               np.array([1000, -1000]) / 32768.0, atol=0)


def test_read_wav_error_paths(tmp_path):
    """Malformed containers fail loudly with the offending path named."""
    p = tmp_path / "bad"
    p.write_bytes(b"not a wav at all")
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        read_wav(p, verbose=False)
    # fmt chunk but no data chunk
    import struct
    body = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    p2 = tmp_path / "nodata.wav"
    p2.write_bytes(b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WAVE"
                   + b"fmt " + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="missing fmt/data"):
        read_wav(p2, verbose=False)
    # unsupported codec (ALAW = 6)
    p3 = tmp_path / "alaw.wav"
    p3.write_bytes(_wav_bytes(6, 1, 8, b"\0\0"))
    with pytest.raises(ValueError, match="unsupported audio format"):
        read_wav(p3, verbose=False)
    # unsupported PCM width
    p4 = tmp_path / "b12.wav"
    p4.write_bytes(_wav_bytes(1, 1, 12, b"\0\0"))
    with pytest.raises(ValueError, match="unsupported bits"):
        read_wav(p4, verbose=False)
    # unsupported float width
    p5 = tmp_path / "f16.wav"
    p5.write_bytes(_wav_bytes(3, 1, 16, b"\0\0"))
    with pytest.raises(ValueError, match="IEEE-float"):
        read_wav(p5, verbose=False)


def test_writer_channel_mismatch_and_encode_errors(tmp_path):
    from tpu_audio.io.wav import WavWriter, encode_frames

    w = WavWriter(tmp_path / "w.wav", 44100, channels=2)
    with pytest.raises(ValueError, match="channels"):
        w.write(np.zeros((4, 3), np.float32))
    w.close()
    with pytest.raises(ValueError, match="unsupported bits"):
        encode_frames(np.zeros((2, 1), np.float32), 12)


def test_writer_riff_payload_clamp(tmp_path):
    """At the RIFF u32 size limit the writer drops further frames (one
    warning) instead of corrupting the header on close: the file stays
    valid with everything written before the limit."""
    from tpu_audio.io.wav import WavWriter

    p = tmp_path / "big.wav"
    w = WavWriter(p, 44100, channels=1, bits=16)
    w.write(np.zeros((8, 1), np.float32))
    w._payload_bytes = w._MAX_PAYLOAD - 4  # pretend ~4 GiB already written
    w.write(np.full((4, 1), 0.5, np.float32))       # would cross: dropped
    assert w._overflow_warned
    w.write(np.full((4, 1), 0.5, np.float32))       # still dropped, quiet
    real_payload = 16
    w._payload_bytes = real_payload                 # restore truth for close
    w.close()
    got = read_wav(p, scale="full", verbose=False)
    assert got.num_frames == 8
    np.testing.assert_array_equal(got.frames, 0)


def test_wav_sample_rate_header_probe(tmp_path):
    """wav_sample_rate reads only the fmt header (the CLI probes inputs
    that can be hours long)."""
    from tpu_audio.io.wav import wav_sample_rate

    frames = np.zeros((100, 2), np.float32)
    p = tmp_path / "r.wav"
    write_wav(p, frames, 48000)
    assert wav_sample_rate(p) == 48000
    bad = tmp_path / "bad"
    bad.write_bytes(b"nope")
    with pytest.raises(ValueError, match="RIFF"):
        wav_sample_rate(bad)
