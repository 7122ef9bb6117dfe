"""Does the remote compile endpoint process concurrent compiles in
parallel? (Round-4 offline-cold-start lever, VERDICT r03 #5.)

The offline bounce's cold start (~32 s on a fresh .bench_cache) is a
handful of SERIAL jit compiles, each a 20-40 s round trip through the
tunnel's remote compile service. XLA releases the GIL while compiling,
so if the endpoint parallelizes, AOT-compiling the bounce's executables
from worker threads (overlapped with the input upload) divides the cold
start by the executable count. This probe measures N distinct programs
compiled serially vs from threads (fresh functions each arm so neither
hits the in-process or persistent cache).

Run on the chip: python examples/probe_compile_parallel.py [N]
"""

import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_fn(tag: float):
    """A distinct (by constant) nontrivial program per call."""
    def f(x):
        for _ in range(3):
            x = jnp.tanh(
                jnp.matmul(x, x, precision=jax.lax.Precision.HIGHEST))
            x = x * tag + jnp.roll(x, 1, axis=0)
        return x
    return jax.jit(f)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    x = jax.device_put(np.ones((512, 512), np.float32) * 0.01)
    float(jnp.sum(x[:2, :2]))          # backend up + first transfer paid

    t0 = time.perf_counter()
    for i in range(n):
        make_fn(1.01 + i * 0.01).lower(x).compile()
    serial = time.perf_counter() - t0
    print(f"serial  x{n}: {serial:.1f}s", flush=True)

    t0 = time.perf_counter()
    threads = [threading.Thread(
        target=lambda k=i: make_fn(2.01 + k * 0.01).lower(x).compile())
        for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    par = time.perf_counter() - t0
    print(f"threads x{n}: {par:.1f}s  (speedup {serial / max(par, 1e-9):.2f}x)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
