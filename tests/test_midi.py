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


def test_system_common_fixed_lengths_and_running_status_survival():
    """F1 (MTC quarter frame) / F2 / F3 / F6 are fixed-length system-common
    messages, NOT SysEx: framing them as 'runs to 0xF7' made one DAW
    quarter-frame swallow every following running-status data byte."""
    f = MidiFramer()
    msgs = f.feed(bytes([0xB0, 0x15, 0x40,      # CC
                         0xF1, 0x05,            # MTC quarter frame (2 bytes)
                         0xB0, 0x16, 0x41,      # explicit-status CC resumes
                         0xF2, 0x01, 0x02,      # song position (3 bytes)
                         0xF6]))                # tune request (1 byte)
    assert msgs == [bytes([0xB0, 0x15, 0x40]), bytes([0xF1, 0x05]),
                    bytes([0xB0, 0x16, 0x41]), bytes([0xF2, 0x01, 0x02]),
                    bytes([0xF6])]


def test_system_common_clears_running_status():
    """SysEx/system common CLEAR running status (MIDI spec): capturing
    0xF0 as running status let a later stray data byte open a phantom
    SysEx that absorbed the rest of the stream."""
    f = MidiFramer()
    f.feed(bytes([0xF0, 0x01, 0x02, 0xF7]))
    assert f.running_status == 0
    # stray data bytes after SysEx: warned and skipped, never assembled
    assert f.feed(bytes([0x10, 0x20, 0x30])) == []
    assert f.feed(bytes([0xB0, 0x15, 0x40])) == [bytes([0xB0, 0x15, 0x40])]
    f2 = MidiFramer()
    f2.feed(bytes([0xB0, 0x15, 0x40, 0xF1, 0x05]))
    assert f2.running_status == 0  # F1 cleared it
    assert f2.feed(bytes([0x16, 0x41])) == []  # data bytes are stray now
