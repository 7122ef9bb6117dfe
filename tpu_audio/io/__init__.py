from tpu_audio.io.settings import Setting, Settings
from tpu_audio.io.wav import WavFile, read_wav, write_wav
from tpu_audio.io.index import load_index, make_index, write_index
from tpu_audio.io.midi import MidiFramer, parse_cc, is_valid_message, cc_bytes

__all__ = [
    "Setting", "Settings",
    "WavFile", "read_wav", "write_wav",
    "load_index", "make_index", "write_index",
    "MidiFramer", "parse_cc", "is_valid_message", "cc_bytes",
]
