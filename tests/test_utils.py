import io
import sys

from tpu_audio.utils.log import Log
from tpu_audio.utils.profiling import BlockTimer


def test_log_levels(capsys):
    old = Log.level
    try:
        Log.level = 3
        Log.force_color = False
        Log.info("t", "hello %d", 42)
        Log.warn("t", "warn %s", "x")
        Log.error("t", "bad")
        Log.newline("cont")
        out = capsys.readouterr()
        assert "hello 42" in out.out
        assert "[t]" in out.out
        assert "warn x" in out.err
        assert "bad" in out.err
        assert "cont" in out.out
        Log.level = 0
        Log.info("t", "silent")
        out = capsys.readouterr()
        assert out.out == ""
    finally:
        Log.level = old
        Log.force_color = None


def test_block_timer_warmup_discard():
    """First `warmup` blocks are excluded from stats (reference conv.h:80)."""
    t = BlockTimer(warmup=3, deadline_s=0.01)
    for i in range(3):
        t.record(100.0)  # huge warmup outliers must be ignored
    for i in range(10):
        t.record(0.001)
    assert t.count == 10
    assert abs(t.avg_runtime() - 0.001) < 1e-9
    assert t.missed == 0


def test_block_timer_deadline_and_percentiles():
    t = BlockTimer(warmup=0, deadline_s=0.005)
    for v in [0.001] * 98 + [0.004, 0.02]:
        t.record(v)
    assert t.missed == 1
    assert t.percentile(50) == 0.001
    assert t.percentile(99) == 0.004
    s = t.summary(block_period_s=256 / 44100)
    assert s["missed_deadlines"] == 1
    assert s["rtf"] > 1


def test_block_timer_start_stop():
    t = BlockTimer(warmup=0)
    t.start()
    elapsed = t.stop()
    assert elapsed >= 0
    assert t.count == 1


def test_wire_pcm16_roundtrip_within_one_lsb():
    """The shared host-link wire codec (used by StreamSession and bench)
    round-trips within one PCM16 LSB and clips out-of-range samples."""
    import jax
    import numpy as np

    from tpu_audio.utils.wire import decode_pcm16, encode_pcm16

    rng = np.random.default_rng(0)
    x = rng.uniform(-1.2, 1.2, (3, 2, 64)).astype(np.float32)
    enc = np.asarray(jax.jit(encode_pcm16)(x))
    assert enc.dtype == np.int16
    got = decode_pcm16(enc)
    np.testing.assert_allclose(got, np.clip(x, -1, 1), atol=1.01 / 32767.0)


def test_engine_package_exports_flagship():
    from tpu_audio.engine import FMajorPartitionedConvolution  # noqa: F401
