"""Time-parallel offline rendering (bounce) — far-faster-than-real-time.

The streaming runtime (runtime/stream.py) serves blocks sequentially: one
256-frame block per dispatch, real-time factor bounded by per-step latency
(~0.8 ms at 64 voices -> RTF ~7). Offline, the whole input is known up
front, and partitioned overlap-save has FINITE memory: one output block
depends only on the trailing `engine.history_blocks` input blocks (the
frequency delay line + predelay ring span) once crossfades are converged.
That makes the time axis segmentable: split the track into S segments,
map each segment onto a VIRTUAL VOICE of the same engine, prime every
voice's state by streaming the `history_blocks` blocks that precede its
segment (warm-up output discarded), then stream all segments concurrently
— the engine's voice axis, which the framework already scales to ~1000
voices real-time on one chip, becomes the time axis. Total step count
drops from T to warmup + ceil(T/S); the per-step cost grows only at the
measured voice-scaling slope (~4 us/voice), so throughput multiplies by
nearly S.

This is the moral opposite of the reference's design point: its CUDA
engine is a real-time JACK callback and nothing else (src/conv.cu:287 —
offline use means playing the file through JACK at 1x). Here the same
tested engine step serves both: `render_offline(model, x)` is exact
(within MAC reassociation noise, ~1e-6) against block-streaming the same
model, fades excluded by construction — parameters are taken from the
model's control plane as already-converged values, the standard bounce
case.

Limits (all checked loudly): static parameters (no MIDI schedule — use
the streaming session for automation), full-resident banks (no
working-set paging: residency faults are sequential-control-flow by
nature), single device.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tpu_audio.utils.log import Log

# measured voice-scaling model for the f32 fmajor engine on one v5e chip
# (README scaling table: ~0.7 ms fixed + ~4 us/voice at 4 s IRs); only
# used to CHOOSE the auto segment count, never for correctness
_STEP_FIXED_MS = 0.7
_STEP_PER_VOICE_MS = 0.004


def _auto_segments(total_blocks: int, warmup: int, base_voices: int,
                   max_virtual_voices: int) -> int:
    """Segment count minimizing (warmup + T/S) * (c0 + c1*V*S): the
    warm-up overhead (W extra steps) trades against per-step voice cost.
    d/dS = 0 at S* = sqrt(c0*T / (W*c1*V))."""
    s = math.sqrt(_STEP_FIXED_MS * total_blocks
                  / (max(warmup, 1) * _STEP_PER_VOICE_MS
                     * max(base_voices, 1)))
    s = int(round(s))
    return max(1, min(s, max(1, max_virtual_voices // max(base_voices, 1)),
                      total_blocks))


def render_offline(model, samples, *, segments: int | None = None,
                   include_tail: bool = True,
                   warmup_blocks: int | None = None,
                   max_virtual_voices: int = 512,
                   fetch_batch: int = 64) -> np.ndarray:
    """Render stereo `samples` [2, T] (or mono [T], duplicated like the
    CLI source) through `model` (ConvolutionReverb) at the control plane's
    current converged parameters. Returns per-voice output [V, 2, T_out]
    — the same convention as the streaming sinks; sum over voices for the
    JACK-playback mix. T_out = T plus the reverb tail when `include_tail`
    (the bounce flushes `history_blocks` of ring-out; the streaming CLI
    needs explicit trailing silence for the same effect).

    `segments=None` picks the segment count from the measured
    voice-scaling model; `max_virtual_voices` caps segments*V (HBM: the
    f32 fmajor state is ~3 MB/voice at 4 s IRs — raise it for bf16 or
    short IRs). `warmup_blocks` overrides the priming depth (testing
    hook; the default `engine.history_blocks` is the exactness
    contract)."""
    if getattr(model, "working_set", None) is not None:
        raise ValueError(
            "render_offline needs a fully-resident bank: working-set "
            "residency pages IRs on sequential select order, which "
            "time-parallel segments do not have (build the model without "
            "bank_capacity for offline bounces)")
    eng = model.engine
    v, b = eng.num_voices, eng.block

    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = np.stack([x, x])
    if x.ndim != 2 or x.shape[0] != 2:
        raise ValueError(f"samples must be [2, T] stereo or [T] mono, "
                         f"got {x.shape}")
    t_samples = x.shape[1]
    t_blocks = -(-t_samples // b)

    warmup = int(warmup_blocks if warmup_blocks is not None
                 else eng.history_blocks)
    tail_blocks = eng.history_blocks if include_tail else 0
    total_blocks = t_blocks + tail_blocks

    # (the cascade's stagger-divisibility invariant holds automatically:
    # num_voices % ratio == 0 is a constructor requirement, so any
    # v * nseg stays divisible)
    if segments is None:
        nseg = min(_auto_segments(total_blocks, warmup, v,
                                  max_virtual_voices), total_blocks)
    else:
        nseg = int(segments)
        if nseg < 1:
            raise ValueError(f"segments must be >= 1, got {segments}")
    seg_len = -(-total_blocks // nseg)

    # block tensor [nseg*seg_len, 2, B], zero-padded head-to-block and
    # tail-to-segment-grid (the zero tail past T flushes the ring-out)
    flat = np.zeros((2, nseg * seg_len * b), np.float32)
    flat[:, :t_samples] = x
    xb = np.ascontiguousarray(
        flat.reshape(2, nseg * seg_len, b).transpose(1, 0, 2))

    if v * nseg == eng.num_voices:
        seng = eng
    elif getattr(eng, "mac_strategy", None) == "allk" and getattr(
            eng, "swap_snapshot", False):
        # a bounce never swaps banks mid-fade (it never fades): drop the
        # fmajor fade snapshot `base` — ~11 MB of dead HBM per virtual
        # voice at 4 s IRs, the difference between ~500 and ~1500 usable
        # segments on one chip
        seng = eng.with_voices(v * nseg, swap_snapshot=False)
    else:
        seng = eng.with_voices(v * nseg)
    bank = model.spectra

    # control-plane snapshot, replicated voice-major: virtual voice
    # v*nseg + s carries voice v's parameters over segment s
    host = model.control.snapshot()
    vparams = jax.tree.map(
        lambda a: jnp.asarray(np.repeat(np.asarray(a), nseg, axis=0)), host)
    state = seng.init_converged(bank, vparams)

    xb_dev = jax.device_put(xb)
    starts = jnp.asarray(np.arange(nseg, dtype=np.int32) * seg_len)
    # converged static params ride the steady hot path on coef engines;
    # materialized/monolithic engines go through their general step (its
    # fade arithmetic is a converged no-op)
    steady = (seng.step_coef_steady
              if getattr(seng, "variant", None) == "coef" else seng.step)
    nt = xb.shape[0]

    @partial(jax.jit, donate_argnums=0)
    def step(st, i):
        idx = starts + i - warmup                       # [nseg]
        xi = jnp.take(xb_dev, jnp.clip(idx, 0, nt - 1), axis=0)
        xi = jnp.where((idx >= 0)[:, None, None], xi, 0.0)
        xi = jnp.tile(xi, (v, 1, 1))                    # [V*nseg, 2, B]
        return steady(st, bank, vparams, xi)

    Log.info("offline", "bounce: %d blocks as %d segment(s) x %d + %d "
             "warm-up steps (%d virtual voices)",
             total_blocks, nseg, seg_len, warmup, v * nseg)

    for i in range(warmup):
        state, _ = step(state, jnp.int32(i))

    chunks, ys = [], []
    for i in range(seg_len):
        state, y = step(state, jnp.int32(warmup + i))
        ys.append(y)
        if len(ys) == fetch_batch:
            chunks.append(jnp.stack(ys))
            ys = []
    if ys:
        chunks.append(jnp.stack(ys))
    # one readback at the end: dispatches above pipeline asynchronously
    out = np.concatenate([np.asarray(c) for c in chunks], axis=0)

    # [seg_len, V*nseg, 2, B] -> [V, 2, nseg*seg_len*B]
    out = (out.reshape(seg_len, v, nseg, 2, b)
              .transpose(1, 3, 2, 0, 4)
              .reshape(v, 2, nseg * seg_len * b))
    out_samples = t_samples + tail_blocks * b if include_tail else t_samples
    return out[..., :out_samples]
