import os

import numpy as np
import pytest

from tpu_audio.io.index import load_index, make_index, write_index
from tpu_audio.io.wav import write_wav


def test_make_and_load_index(tmp_path):
    bank = tmp_path / "bank"
    (bank / "sub").mkdir(parents=True)
    for name in ["a.wav", "b.wav", "sub/c.wav"]:
        write_wav(bank / name, np.zeros((10, 2), np.float32), 44100)
    entries = make_index(bank)
    assert len(entries) == 3
    assert entries == sorted(entries)

    idx = tmp_path / "bank.index"
    write_index(idx, entries)
    loaded = load_index(idx)
    assert loaded == entries


def test_load_index_relative_to_index_dir(tmp_path, monkeypatch):
    bank = tmp_path / "bank"
    bank.mkdir()
    write_wav(bank / "x.wav", np.zeros((4, 1), np.float32), 44100)
    idx = tmp_path / "rel.index"
    idx.write_text("bank/x.wav\n")
    monkeypatch.chdir("/")  # cwd-relative resolution fails -> index-dir fallback
    loaded = load_index(idx)
    assert len(loaded) == 1
    assert os.path.exists(loaded[0])


def test_missing_entries_raise_to_preserve_numbering(tmp_path):
    """A silently skipped entry would shift every later bank index, so
    settings select values address the WRONG IRs; must_exist=True raises
    (the reference also dies here: wav.cu asserts on open failure)."""
    idx = tmp_path / "m.index"
    idx.write_text("a.wav\ndoes/not/exist.wav\nb.wav\n")
    (tmp_path / "a.wav").write_bytes(b"")
    (tmp_path / "b.wav").write_bytes(b"")
    with pytest.raises(FileNotFoundError, match="does/not/exist.wav"):
        load_index(idx)
    # numbering-preserving escape hatch: raw entries kept in place
    entries = load_index(idx, must_exist=False)
    assert len(entries) == 3 and entries[1] == "does/not/exist.wav"


def test_reference_index_files():
    path = "/root/reference/ir/all.index"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    entries = load_index(path, must_exist=False)
    assert len(entries) > 100
    assert all(e.endswith(".wav") for e in entries)
