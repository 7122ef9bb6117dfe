"""Live MIDI byte transports.

The reference reads raw MIDI bytes from an ALSA device on a dedicated
thread (reference src/midi.cu:22-59). A TPU serving host usually has no
ALSA; control bytes arrive over a FIFO, socket, or file instead. These
transports poll a byte stream non-blockingly between audio blocks and push
framed messages into the ControlPlane — same role, same cadence (the
reference's thread also just interleaves with the audio callback).

Usage with StreamSession: pass ``live_midi=MidiByteStream(...)`` — events
are applied at block boundaries exactly like a MidiSchedule.
"""

from __future__ import annotations

import os

from tpu_audio.io.midi import MidiFramer
from tpu_audio.utils.log import Log


class MidiByteStream:
    """Non-blocking framed reader over a fd / FIFO / file path.

    Uses the C framer when the native library is available, else the
    Python framer (identical semantics, tests/test_native.py).
    """

    def __init__(self, path_or_fd, device: str = "", use_native: bool = True):
        if isinstance(path_or_fd, int):
            self.fd = path_or_fd
            self._owns = False
        else:
            # O_NONBLOCK so an idle FIFO never stalls the audio loop
            self.fd = os.open(os.fspath(path_or_fd),
                              os.O_RDONLY | os.O_NONBLOCK)
            self._owns = True
        os.set_blocking(self.fd, False)
        self.device = device
        self.framer = None
        if use_native:
            try:
                from tpu_audio.runtime.native import (
                    NativeMidiFramer, native_available,
                )
                if native_available():
                    self.framer = NativeMidiFramer()
            except Exception:  # pragma: no cover - toolchain-dependent
                self.framer = None
        if self.framer is None:
            self.framer = MidiFramer()

    def poll(self) -> list[tuple[str, bytes]]:
        """Drain available bytes; return framed (device, message) events."""
        events: list[tuple[str, bytes]] = []
        while True:
            try:
                chunk = os.read(self.fd, 4096)
            except BlockingIOError:
                break
            except OSError as exc:
                Log.warn("midi", "transport read error: %s", exc)
                break
            if not chunk:
                break
            for message in self.framer.feed(chunk):
                events.append((self.device, message))
            if len(chunk) < 4096:
                break
        return events

    def close(self) -> None:
        if self._owns and self.fd >= 0:
            os.close(self.fd)
            self.fd = -1


class MultiMidiStream:
    """Aggregates several MidiByteStreams (one per device) into one
    poll() source — the reference's one-reader-thread-per-ALSA-device
    fan-in (src/main.cu:47-48, src/midi.cu:61-108): each stream's events
    carry its device id, and the ControlPlane routes them to the channels
    whose CCMapping.device matches."""

    def __init__(self, streams: list[MidiByteStream]):
        self.streams = list(streams)

    def poll(self) -> list[tuple[str, bytes]]:
        events: list[tuple[str, bytes]] = []
        for stream in self.streams:
            events.extend(stream.poll())
        return events

    def close(self) -> None:
        for stream in self.streams:
            stream.close()
