import os

import pytest

from tpu_audio.io.settings import Settings

EXAMPLE = """
# comment line
conv.count 2

conv[0].fftSize \t131072
conv[0].index\t./ir/all.index
conv[0].cc.message\t176
conv[0].value.dry\t0.5
conv[0].value.panDry \t0
flag.on true
flag.off no
# trailing comment
"""


def make() -> Settings:
    s = Settings()
    s.parse(EXAMPLE)
    return s


def test_basic_types():
    s = make()
    assert s.u32("conv.count") == 2
    assert s.u32("conv[%d].fftSize", 0) == 131072
    assert s.str("conv[%d].index", 0) == "./ir/all.index"
    assert s.u8("conv[%d].cc.message", 0) == 176
    assert s.f32("conv[%d].value.dry", 0) == pytest.approx(0.5)
    assert s.f32("conv[%d].value.panDry", 0) == 0.0


def test_bool_semantics():
    s = make()
    assert s.is_true("flag.on")
    assert not s.is_true("flag.off")
    assert s.is_false("flag.off")


def test_missing_key_raises_and_default():
    s = make()
    with pytest.raises(KeyError):
        s.u32("conv[%d].fftSize", 9)
    assert s.u32("conv[%d].fftSize", 9, default=2048) == 2048
    assert s.str("nope", default="") == ""


def test_u8_masks():
    s = Settings().parse("big 300")
    assert s.u8("big") == 300 & 0xFF
    assert s.u16("big") == 300


def test_reference_settings_file_parses():
    path = "/root/reference/settings.txt"
    if not os.path.exists(path):
        pytest.skip("reference settings not mounted")
    s = Settings().open(path, verbose=False)
    assert s.u32("conv.count") == 2
    assert s.u32("conv[%d].fftSize", 1) == 131072
    assert s.str("conv[%d].cc.device", 0) == "hw:2,0"
    assert s.f32("conv[%d].value.level", 1) == pytest.approx(1.0)
    assert s.u32("conv[%d].value.predelay", 0) == 1024


def test_save_roundtrip(tmp_path):
    s = make()
    out = tmp_path / "saved.txt"
    s.save(out)
    s2 = Settings().open(out, verbose=False)
    assert s2.u32("conv.count") == 2
    assert s2.str("conv[%d].index", 0) == "./ir/all.index"
    assert len(s2) == len(s)


def test_zero_padded_decimal_parses_like_stoi():
    """The reference parses with std::stoi (base 10): '010' is decimal 10.
    int(x, 0) rejected it as malformed octal, breaking file compat."""
    s = Settings()
    s.parse("a 010\nb 0x1F\nc 8\n", verbose=False)
    assert s.u32("a") == 10
    assert s.u32("b") == 0x1F  # explicit-prefix extension still works
    assert s.u8("c") == 8


def test_settings_dict_protocol_and_save(tmp_path):
    from tpu_audio.io.settings import Setting, Settings

    s = Settings()
    s["a.b"] = 3
    s["c"] = Setting("c", "hello")
    assert "a.b" in s and len(s) == 2
    assert set(iter(s)) == {"a.b", "c"}
    assert set(s.keys()) == {"a.b", "c"}
    assert dict(s.items())["c"].str() == "hello"
    assert "hello" in repr(s["c"])
    p = tmp_path / "out.txt"
    s.save(p)
    s2 = Settings().open(p, verbose=False)
    assert s2.str("c") == "hello"
    assert s2.u32("a.b") == 3


def test_settings_odd_token_count_drops_last_key(tmp_path):
    """A trailing key with no value parses the rest and warns (the
    reference's token-stream loop would read past the end)."""
    from tpu_audio.io.settings import Settings

    p = tmp_path / "odd.txt"
    p.write_text("x 1\ndangling")
    s = Settings().open(p, verbose=False)
    assert s.u32("x") == 1
    assert "dangling" not in s


def test_settings_bad_value_raises_loudly(tmp_path):
    from tpu_audio.io.settings import Settings
    import pytest

    p = tmp_path / "bad.txt"
    p.write_text("n notanumber")
    s = Settings().open(p, verbose=False)
    with pytest.raises(ValueError):
        s.u32("n")
    with pytest.raises(KeyError):
        s.u32("missing")
    assert s.u32("missing", default=7) == 7
