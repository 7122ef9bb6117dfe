"""Randomized end-to-end equivalence: production engine vs reference engine.

Every block mutates a random subset of parameters (wet/dry/pan/level/predelay/
speed via CC-scaled values, occasional IR re-selects with collapse) — the
kind of interaction coverage individual tests can't enumerate. The f-major
ring engine must track the complex-array coef engine within bf16-fade
tolerance at all times and exactly whenever no fade is in flight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.engine import ControlPlane, IRBank, PartitionedConvolution
from tpu_audio.engine.fmajor import FMajorPartitionedConvolution


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("strategy", ["allk", "selected"])
def test_fuzz_param_trajectories(seed, strategy):
    rng = np.random.default_rng(100 + seed)
    v, block, n_irs = 2, 32, 4
    bank = IRBank()
    for _ in range(n_irs):
        ir = rng.standard_normal((2, int(rng.integers(60, 300)))).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    p = bank.max_partitions(block)
    spectra = bank.partitioned_spectra(block)

    ref = PartitionedConvolution(v, block, p, max_predelay=64, variant="coef")
    fm = FMajorPartitionedConvolution(v, block, p, max_predelay=64,
                                      mac_strategy=strategy)
    bank_ref = jnp.asarray(spectra)
    bank_fm = fm.prepare_bank(spectra)

    cp = ControlPlane(v, n_irs, max_predelay=64)
    cp.speed[:] = 5
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    s_ref = ref.init_converged(bank_ref, params)
    s_fm = fm.init_converged(bank_fm, params)

    fading_until = -1
    for t in range(120):
        # random parameter mutations (CC-scaled ranges)
        if rng.random() < 0.4:
            cp.wet[rng.integers(v), rng.integers(2)] = rng.integers(128) / 128
        if rng.random() < 0.3:
            cp.dry[rng.integers(v), rng.integers(2)] = rng.integers(128) / 128
        if rng.random() < 0.3:
            cp.pan_wet[rng.integers(v), rng.integers(2)] = rng.integers(128) / 64 - 1
        if rng.random() < 0.3:
            cp.level[rng.integers(v), rng.integers(2)] = rng.integers(128) / 128
        if rng.random() < 0.2:
            cp.predelay[rng.integers(v), 0] = rng.integers(0, 65)
        if rng.random() < 0.1:
            old = cp.select.copy()
            cp.set_select(int(rng.integers(v)), int(rng.integers(2)),
                          int(rng.integers(n_irs)))
            changed = cp.select != old
            if changed.any():
                s_ref = ref.collapse(s_ref, bank_ref, jnp.asarray(old),
                                     jnp.asarray(changed))
                s_fm = fm.collapse(s_fm, bank_fm, jnp.asarray(old),
                                   jnp.asarray(changed),
                                   new_select=jnp.asarray(cp.select))
                fading_until = t + 60  # vsteps=5 -> (4/5)^k decay + margin

        params = jax.tree.map(jnp.asarray, cp.snapshot())
        x = jnp.asarray(rng.standard_normal((v, 2, block)).astype(np.float32)
                        * 0.05)
        s_ref, o_ref = ref.step_coef(s_ref, bank_ref, params, x)
        s_fm, o_fm = fm.step_coef(s_fm, bank_fm, params, x)
        cp.end_block()

        atol = 2e-3 if t <= fading_until else 5e-5
        np.testing.assert_allclose(np.asarray(o_fm), np.asarray(o_ref),
                                   atol=atol,
                                   err_msg=f"seed {seed} block {t} "
                                           f"(fading={t <= fading_until})")
