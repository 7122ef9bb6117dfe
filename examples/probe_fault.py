"""Same-process A/B timing of working-set fault uploads: fault_upload
'dual' (rhs2 column + rev2 slot, ~2x bytes) vs 'derived' (rev2 slot only,
MAC column rebuilt on device — engine/fmajor.py update_bank_slot).

Interleaves the two variants round-robin so tunnel weather hits both
equally (cross-process numbers differ 1.5-2x from weather alone — see
CLAUDE.md). Each fault is host pack + H2D payload + slot-update jit +
a one-element readback to force completion ("block_until_ready lies" on
this transport). First fault per variant reported separately (compile).

Usage (real chip):
    python examples/probe_fault.py [--voices 64] [--ir-seconds 4]
        [--num-irs 16] [--reps 8] [--mac-dtype f32]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voices", type=int, default=64)
    ap.add_argument("--ir-seconds", type=float, default=4.0)
    ap.add_argument("--num-irs", type=int, default=16)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--sample-rate", type=int, default=44100)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--mac-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the plugin clobbers "
                         "JAX_PLATFORMS; only the post-import config works)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpu_audio.engine.fmajor import FMajorPartitionedConvolution

    rng = np.random.default_rng(7)
    n = int(args.ir_seconds * args.sample_rate)
    p = -(-n // args.block)
    f = args.block + 1
    k = args.num_irs

    def fresh_spectra(seed):
        r = np.random.default_rng(seed)
        return (r.standard_normal((1, 2, p, f))
                + 1j * r.standard_normal((1, 2, p, f))).astype(np.complex64)

    spectra0 = (rng.standard_normal((k, 2, p, f))
                + 1j * rng.standard_normal((k, 2, p, f))).astype(np.complex64)

    engines = {}
    banks = {}
    for mode in ("dual", "derived"):
        eng = FMajorPartitionedConvolution(
            args.voices, args.block, p, max_predelay=8192,
            mac_strategy="allk", num_irs=k, mac_dtype=args.mac_dtype,
            fault_upload=mode)
        engines[mode] = eng
        banks[mode] = eng.prepare_bank(spectra0)
        print(f"{mode}: engine + bank ready", flush=True)

    times = {"dual": [], "derived": []}
    for i in range(args.reps):
        payload = fresh_spectra(100 + i)
        for mode in ("dual", "derived"):
            t0 = time.perf_counter()
            banks[mode] = engines[mode].update_bank_slot(
                banks[mode], i % k, payload)
            _ = np.asarray(banks[mode].rhs2[0, 0, 0, (i % k) * 4])
            ms = (time.perf_counter() - t0) * 1e3
            times[mode].append(ms)
            print(f"rep {i} {mode:8s} {ms:9.1f} ms", flush=True)

    for mode in ("dual", "derived"):
        t = times[mode]
        warm = t[1:] or t
        print(f"{mode:8s}: first {t[0]:.1f} ms (incl. compile) | "
              f"warm median {np.median(warm):.1f} ms over {len(warm)}",
              flush=True)
    # exactness cross-check on the last write: both banks saw identical
    # payload sequences, so every leaf must be bit-equal
    for leaf in ("rhs2", "spectra_rev2"):
        a = np.asarray(getattr(banks["dual"], leaf))
        b = np.asarray(getattr(banks["derived"], leaf))
        np.testing.assert_array_equal(a, b, err_msg=leaf)
    print("banks bit-equal across modes OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
