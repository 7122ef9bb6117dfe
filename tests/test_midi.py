from tpu_audio.io.midi import MidiFramer, cc_bytes, is_valid_message, parse_cc


def test_basic_cc_message():
    f = MidiFramer()
    msgs = f.feed(bytes([0xB0, 21, 64]))
    assert msgs == [bytes([0xB0, 21, 64])]
    assert parse_cc(msgs[0]) == (0xB0, 21, 64)


def test_running_status():
    """Data bytes with no status byte re-use the last status
    (reference src/midi.cu:53-55)."""
    f = MidiFramer()
    msgs = f.feed(bytes([0xB0, 21, 64, 22, 100, 23, 1]))
    assert msgs == [
        bytes([0xB0, 21, 64]),
        bytes([0xB0, 22, 100]),
        bytes([0xB0, 23, 1]),
    ]


def test_running_status_across_feeds():
    f = MidiFramer()
    assert f.feed(bytes([0xB0, 21])) == []
    assert f.feed(bytes([64])) == [bytes([0xB0, 21, 64])]
    assert f.feed(bytes([25, 127])) == [bytes([0xB0, 25, 127])]


def test_note_on_off():
    f = MidiFramer()
    msgs = f.feed(bytes([0x90, 60, 127, 0x80, 60, 0]))
    assert msgs == [bytes([0x90, 60, 127]), bytes([0x80, 60, 0])]


def test_sysex_terminator():
    """0xF0-family messages complete at 0xF7 (reference src/midi.cu:13-14)."""
    f = MidiFramer()
    msgs = f.feed(bytes([0xF0, 1, 2, 3, 0xF7]))
    assert msgs == [bytes([0xF0, 1, 2, 3, 0xF7])]


def test_program_change_two_bytes():
    f = MidiFramer()
    assert f.feed(bytes([0xC0, 5])) == [bytes([0xC0, 5])]


def test_pitch_bend_three_bytes():
    f = MidiFramer()
    assert f.feed(bytes([0xE0, 0, 64])) == [bytes([0xE0, 0, 64])]


def test_garbage_byte_does_not_crash():
    f = MidiFramer()
    assert f.feed(bytes([0x42])) == []  # data byte, no running status
    assert f.feed(bytes([0xB1, 21, 3])) == [bytes([0xB1, 21, 3])]


def test_realtime_bytes_transparent():
    """0xF8+ system-realtime bytes pass through without disturbing running
    status or an in-flight message (MIDI spec; deliberate fix over the
    reference's framing, src/midi.cu:53)."""
    f = MidiFramer()
    out = f.feed(bytes([0xB0, 21, 64, 0xFE, 22, 9]))
    assert out == [bytes([0xB0, 21, 64]), bytes([0xFE]), bytes([0xB0, 22, 9])]
    out = f.feed(bytes([0xB0, 23, 0xF8, 5]))  # clock mid-message
    assert out == [bytes([0xF8]), bytes([0xB0, 23, 5])]


def test_is_valid_message():
    assert is_valid_message(bytes([0xB0, 1, 2]))
    assert not is_valid_message(bytes([0xB0, 1]))
    assert is_valid_message(bytes([0xF0, 0xF7]))
    assert not is_valid_message(b"")


def test_cc_bytes_helper():
    assert cc_bytes(0, 21, 64) == bytes([0xB0, 21, 64])
    assert parse_cc(cc_bytes(3, 28, 127)) == (0xB3, 28, 127)
