"""Warm-chain sensitivity of the cascade_2048 flagship leg (VERDICT r04
#7): the leg read RTF 1.256 in the driver's run vs 1.30-1.31 in four
consecutive builder runs the same day; the suspected cause is
executable-load / HBM-placement bleed into the first timed dispatches.
This probe builds the EXACT leg configuration once and measures the
steady step after warm chains of increasing length — all in ONE process
(cross-process numbers differ 1.5-2x from tunnel weather alone).

Usage: python examples/probe_warmchain.py [--voices 2048] [--chains 4,8,16,32,64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--voices", type=int, default=2048)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--chains", default="4,8,16,32,64")
    ap.add_argument("--blocks", type=int, default=64,
                    help="timed chain length per measurement")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import bench
    from tpu_audio.engine import ControlPlane
    from tpu_audio.engine.cascade import CascadeConvolution
    from tpu_audio.models.reverb import _fit_cascade_ratio
    from tpu_audio.utils.layouts import (backend_supports_layouts,
                                         compile_auto_layout,
                                         pinned_init, place_in_formats)

    v = args.voices
    bank = bench.make_bank(4, 4.0, 44100)
    partitions = bank.max_partitions(256)
    ratio = _fit_cascade_ratio(16, v, partitions)
    engine = CascadeConvolution(v, 256, partitions, ratio=ratio,
                                max_predelay=8192, num_irs=4,
                                mac_dtype=args.dtype, predelay_side="read")
    spectra = engine.prepare_bank(bank, device=False)
    control = ControlPlane(v, 4)
    control.wet[:] = 0.7
    control.dry[:] = 0.2
    control.predelay[:] = 1024
    params = jax.tree.map(jnp.asarray, control.snapshot())
    rng = np.random.default_rng(2)
    pool = [jnp.asarray(rng.standard_normal((v, 2, 256)).astype(np.float32)
                        * 0.05) for _ in range(4)]

    state_shape = jax.eval_shape(lambda: engine.init_state())
    if backend_supports_layouts():
        steady, state_fmt = compile_auto_layout(
            engine.step_coef_steady, (state_shape, spectra, params, pool[0]))
        spectra = place_in_formats(spectra, steady.input_formats[0][1],
                                   "bank")
        state = pinned_init(lambda: engine.init_converged(spectra, params),
                            state_fmt)
    else:
        spectra = jax.tree.map(jnp.asarray, spectra)
        steady = jax.jit(engine.step_coef_steady, donate_argnums=(0,))
        state = engine.init_converged(spectra, params)
    print("built; measuring", flush=True)

    deadline = 256 / 44100 * 1e3
    total_warm = 0
    for chain in (int(c) for c in args.chains.split(",")):
        # warm: chain extra steps beyond whatever ran before
        for t in range(chain):
            state, out = steady(state, spectra, params, pool[t % 4])
        _ = np.asarray(out[0, 0, :4])
        total_warm += chain
        best = float("inf")
        for rep in range(args.reps):
            t0 = time.perf_counter()
            for t in range(args.blocks):
                state, out = steady(state, spectra, params, pool[t % 4])
            _ = np.asarray(out[0, 0, :4])
            best = min(best, (time.perf_counter() - t0) / args.blocks * 1e3)
        print(f"warm-chain cum {total_warm:4d}: steady {best:.3f} ms "
              f"(RTF {deadline / best:.3f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
