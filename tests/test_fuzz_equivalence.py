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


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_session_production_vs_reference_engine(seed):
    """SESSION-level fuzz: the full production runtime (fmajor + indexed
    fades + deferred collapse_pure + steady switching, driven by scripted
    MIDI through StreamSession) must track a partitioned-coef reference
    session through random re-selects — including interrupts — and match
    it exactly once fades decay."""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import MidiSchedule

    rng = np.random.default_rng(200 + seed)
    n_irs, block, n_blocks = 3, 32, 140
    irs = []
    for _ in range(n_irs):
        ir = rng.standard_normal((2, int(rng.integers(60, 200)))).astype(np.float32)
        irs.append(ir * (0.4 / np.abs(ir).max()))

    # random CC events: selects (possibly interrupting), wet/dry/speed
    events = []
    for _ in range(10):
        b = int(rng.integers(2, n_blocks - 30))
        cc, vmax = [(0x15, 127), (0x17, 127), (0x18, 127)][rng.integers(3)]
        events.append((b, "", bytes([0xB0, cc, int(rng.integers(vmax + 1))])))

    def run(engine_name):
        bank = IRBank()
        for ir in irs:
            bank.append(ir)
        m = ConvolutionReverb(bank, num_voices=2, block=block,
                              engine=engine_name, max_predelay=64)
        for ch in range(2):
            m.control.set_mapping(0, ch, CCMapping(
                message=0xB0, select=0x15, dry=0x17, wet=0x18))
        m.control.speed[:] = 6
        m.control.wet[:] = 0.8
        m.control.dry[:] = 0.2
        x = np.random.default_rng(300 + seed).standard_normal(
            (2, 2, block * n_blocks)).astype(np.float32) * 0.05
        sink = WavSink("/dev/null", keep_data=True)
        sess = m.session(WavSource(x, 2, block), sink, warmup=0)
        sess.run(m.init_state(), midi=MidiSchedule(list(events)))
        return sink.data, sess

    got_fm, sess_fm = run("fmajor")
    got_ref, _ = run("partitioned")
    assert got_fm.shape == got_ref.shape
    # bf16 fade-snapshot scale during fades; the last 30 blocks are
    # event-free so fades have decayed to ~(5/6)^30 of bf16 noise
    np.testing.assert_allclose(got_fm, got_ref, atol=4e-3,
                               err_msg=f"seed {seed}")
    tail = slice(-block * 8, None)
    np.testing.assert_allclose(got_fm[..., tail], got_ref[..., tail],
                               atol=1e-4, err_msg=f"seed {seed} (tail)")
