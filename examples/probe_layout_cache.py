"""Layout/persistent-cache trust bisect (the 2026-08-18 root-cause probe).

Reproduces the four process states that isolated CLAUDE.md landmine 7's
(b)+(c): an AUTO-pinned compile's claimed input formats are DETERMINISTIC
and HONEST, but `jax.device_put(arr, Format)` silently emits a different
layout when a persistent compile-cache dir is configured — the relayout
program it lowers collides across target layouts in the cache key (the
key omits layout constraints), so a poisoned entry "refuses" the request.

Variants (run each in a FRESH process):
  A  clean: no cache dir, no prior compile          -> placement honors
  B  cache dir configured                           -> placement REFUSED
  C  cache dir + one cache-enabled compile first    -> placement REFUSED
     (the bench.py state; also demonstrates that is_cache_used()'s
     process-global memoization makes a later flag-only disable a no-op)
  D  prior compile only, no cache dir               -> placement honors

Measured 2026-08-18 21:3x (TPU v5e via tunnel): A/D honored both probed
bank leaves; B/C refused both — e.g. (257,2,64,16) f32 claimed
(0,1,3,2) came back (1,2,3,0). After utils/layouts.py routed every
pinned compile AND placement rung through the memoization-overriding
compilation_cache_disabled(), all bench legs passed in one run.

Usage:  python examples/probe_layout_cache.py {A|B|C|D} [--cache-dir D]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["A", "B", "C", "D"])
    ap.add_argument("--cache-dir", default=".bench_cache",
                    help="pack cache dir; <dir>/xla is the persistent "
                         "compile cache for variants B/C")
    ap.add_argument("--voices", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.variant in ("B", "C"):
        import os
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(args.cache_dir, "xla"))

    from tpu_audio.engine import ControlPlane
    from tpu_audio.engine.cascade import CascadeConvolution
    from tpu_audio.models.reverb import _fit_cascade_ratio
    from tpu_audio.utils import layouts as L
    from tpu_audio.engine.bank import IRBank

    t0 = time.time()

    def log(msg):
        print(f"[{args.variant} t+{time.time()-t0:5.1f}s] {msg}",
              flush=True)

    if args.variant in ("C", "D"):
        jnp.asarray(
            jax.jit(lambda a: a * 2 + 1)(jnp.ones((128, 128)))[0, 0])
        log("cache-enabled warmup compile done")

    rng = np.random.default_rng(0)
    bank = IRBank(sample_rate=44100)
    for _ in range(4):
        bank.append(rng.standard_normal(
            (2, int(4.0 * 44100))).astype(np.float32) * 0.05)
    parts = bank.max_partitions(256)
    ratio = _fit_cascade_ratio(16, args.voices, parts)
    eng = CascadeConvolution(args.voices, 256, parts, ratio=ratio,
                             max_predelay=8192, num_irs=4)
    spectra = eng.prepare_bank(bank, cache_dir=args.cache_dir, device=False)
    control = ControlPlane(args.voices, 4)
    control.wet[:] = 0.7
    params = jax.tree.map(jnp.asarray, control.snapshot())
    x = jnp.zeros((args.voices, 2, 256), jnp.float32)
    state_shape = jax.eval_shape(lambda: eng.init_state())

    steady, _ = L.compile_auto_layout(
        eng.step_coef_steady, (state_shape, spectra, params, x))
    log("AUTO steady compiled")
    fmts = jax.tree.leaves(steady.input_formats[0][1],
                           is_leaf=lambda f: f is None)
    refused = 0
    for a, f in zip(jax.tree.leaves(spectra), fmts):
        if f is None:
            continue
        b = jax.device_put(np.asarray(a), f)
        ok = str(b.format) == str(f)
        refused += (not ok)
        log(f"leaf {np.asarray(a).shape}: claimed "
            f"{f.layout.major_to_minor} achieved "
            f"{b.format.layout.major_to_minor} "
            f"{'OK' if ok else 'REFUSED'}")
    log(f"refused={refused} (A/D expect 0; B/C expect >0 on a backend "
        f"whose cache holds colliding relayout entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
