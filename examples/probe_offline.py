"""On-chip probe for the time-parallel offline renderer (bench's offline
leg, standalone): wall-clock RTF for a 120 s bounce at the flagship IR
geometry. Used to validate the device-carried step index (per-step host
scalar uploads serialize dispatches on high-RTT transports)."""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--num-irs", type=int, default=4)
    ap.add_argument("--ir-seconds", type=float, default=4.0)
    ap.add_argument("--segments", type=int, default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--automate", action="store_true",
                    help="replay a MIDI automation timeline (re-selects "
                         "every ~10 s + wet sweeps) instead of static "
                         "params — measures the automation overhead")
    args = ap.parse_args()

    from bench import make_bank
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.offline import render_offline

    bank = make_bank(args.num_irs, args.ir_seconds, 44100)
    model = ConvolutionReverb(bank, num_voices=1, block=256,
                              sample_rate=44100, engine="fmajor",
                              cache_dir=".bench_cache")
    model.control.wet[:] = 0.7
    model.control.dry[:] = 0.2
    schedule = None
    if args.automate:
        from tpu_audio.engine.params import CCMapping
        from tpu_audio.runtime.stream import MidiSchedule
        model.control.set_mapping(0, 0, CCMapping(
            message=0xB0, select=21, wet=24, speed=25))
        blocks_per_10s = int(10 * 44100 / 256)
        events = []
        for j, t in enumerate(range(
                20, int(args.seconds * 44100 / 256), blocks_per_10s)):
            events.append((t, "", bytes([0xB0, 0x15,
                                         (j * 43) % 128])))   # re-select
            events.append((t + 600, "", bytes([0xB0, 0x18,
                                               40 + (j * 17) % 60])))
        schedule = MidiSchedule(events)
        print(f"automation: {len(events)} events", flush=True)
    rng = np.random.default_rng(11)
    n = int(args.seconds * 44100)
    x = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
    for rep in range(args.reps):
        t0 = time.perf_counter()
        out = render_offline(model, x, segments=args.segments,
                             schedule=schedule)
        wall = time.perf_counter() - t0
        print(f"rep {rep}: {args.seconds:g} s bounced in {wall:.3f} s "
              f"(RTF {args.seconds / wall:.1f})", flush=True)
    assert np.isfinite(out).all()
    return 0


if __name__ == "__main__":
    sys.exit(main())
