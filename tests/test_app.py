import os

import numpy as np
import pytest

from tpu_audio.engine import IRBank
from tpu_audio.io.index import write_index
from tpu_audio.io.settings import Settings
from tpu_audio.io.wav import read_wav, write_wav
from tpu_audio.models.reverb import ConvolutionReverb

SETTINGS_TEMPLATE = """
conv.count 2
conv[0].fftSize 2048
conv[0].maxPredelay 128
conv[0].index {index}
conv[0].cc.device hw:9,0
conv[0].cc.message 176
conv[0].cc.select 21
conv[0].cc.predelay 22
conv[0].cc.dry 23
conv[0].cc.wet 24
conv[0].cc.speed 25
conv[0].cc.panDry 26
conv[0].cc.panWet 26
conv[0].cc.level 28
conv[0].value.select 1
conv[0].value.predelay 16
conv[0].value.dry 0.4
conv[0].value.wet 0.6
conv[0].value.speed 50
conv[0].value.panDry 0
conv[0].value.panWet 0
conv[0].value.level 0.9
conv[1].fftSize 2048
conv[1].maxPredelay 128
conv[1].index {index}
conv[1].cc.device hw:9,0
conv[1].cc.message 176
conv[1].cc.select 21
conv[1].cc.predelay 22
conv[1].cc.dry 23
conv[1].cc.wet 24
conv[1].cc.speed 25
conv[1].cc.panDry 27
conv[1].cc.panWet 27
conv[1].cc.level 28
conv[1].value.select 0
conv[1].value.predelay 16
conv[1].value.dry 0.4
conv[1].value.wet 0.6
conv[1].value.speed 50
conv[1].value.panDry 0
conv[1].value.panWet 0
conv[1].value.level 0.9
"""


@pytest.fixture
def settings_env(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for k in range(2):
        ir = rng.uniform(-0.3, 0.3, (150, 2)).astype(np.float32)
        p = tmp_path / f"ir{k}.wav"
        write_wav(p, ir, 44100)
        paths.append(str(p))
    idx = tmp_path / "bank.index"
    write_index(idx, paths)
    sfile = tmp_path / "settings.txt"
    sfile.write_text(SETTINGS_TEMPLATE.format(index=idx))
    return sfile, tmp_path


def test_from_settings_wiring(settings_env):
    """Reference wiring semantics (src/main.cu:25-70)."""
    sfile, _ = settings_env
    model = ConvolutionReverb.from_settings(
        str(sfile), block=64, verbose=False)
    assert model.engine.num_voices == 1
    assert len(model.bank) == 2
    cp = model.control
    assert cp.select[0, 0] == 1 and cp.select[0, 1] == 0
    assert cp.predelay[0, 0] == 16
    assert cp.dry[0, 0] == np.float32(0.4)
    assert cp.speed[0, 1] == 50
    assert cp.level[0, 0] == np.float32(0.9)
    m = cp.mappings[(0, 1)]
    assert m.device == "hw:9,0"
    assert m.pan_dry == 27 and m.pan_wet == 27
    assert cp.mappings[(0, 0)].pan_dry == 26


def test_from_settings_voice_scaleout(settings_env):
    """num_voices beyond conv.count/2 replicates voice 0's config."""
    sfile, _ = settings_env
    model = ConvolutionReverb.from_settings(str(sfile), block=64,
                                            num_voices=4, verbose=False)
    assert model.engine.num_voices == 4
    assert model.control.select[3, 0] == 1
    assert model.control.mappings[(3, 1)].message == 176


def test_from_settings_odd_count_rejected(tmp_path):
    sfile = tmp_path / "s.txt"
    sfile.write_text("conv.count 3\n")
    with pytest.raises(ValueError):
        ConvolutionReverb.from_settings(str(sfile), verbose=False)


def test_app_cli_end_to_end(settings_env, tmp_path):
    """Drive the CLI main() like a user: settings + input WAV -> output WAV."""
    from tpu_audio.app.main import main
    sfile, base = settings_env
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.2, 0.2, (800, 2)).astype(np.float32)
    write_wav(base / "in.wav", x, 44100, scale="full")
    out = base / "out.wav"
    rc = main(["--settings", str(sfile), "--input", str(base / "in.wav"),
               "--output", str(out), "--block-size", "64", "--quiet"])
    assert rc == 0
    assert os.path.exists(out)
    w = read_wav(out, scale="full", verbose=False)
    assert w.num_frames >= 800
    assert np.abs(w.frames).max() > 1e-4  # produced signal
    assert np.abs(w.frames).max() <= 1.5


def test_app_cli_with_midi_schedule(settings_env, tmp_path):
    from tpu_audio.app.main import main
    sfile, base = settings_env
    midi = base / "events.txt"
    midi.write_text("2 B0 15 7F\n4 B0 18 40\n")  # select + dry change
    out = base / "imp.wav"
    rc = main(["--settings", str(sfile), "--signal", "impulse",
               "--blocks", "8", "--block-size", "64",
               "--output", str(out), "--midi", str(midi), "--quiet"])
    assert rc == 0
    assert os.path.exists(out)


def test_app_missing_settings_errors(tmp_path):
    from tpu_audio.app.main import main
    assert main(["--settings", str(tmp_path / "nope.txt"), "--quiet"]) == 2
