import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.engine import ControlPlane, IRBank, PartitionedConvolution
from tpu_audio.engine.fmajor import FMajorPartitionedConvolution


def build(num_voices=4, block=32, ir_len=300, num_irs=3, seed=0, ring=True):
    rng = np.random.default_rng(seed)
    bank = IRBank()
    for _ in range(num_irs):
        ir = rng.standard_normal((2, ir_len)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    p = bank.max_partitions(block)
    ref = PartitionedConvolution(num_voices, block, p, max_predelay=64,
                                 variant="coef")
    fm = FMajorPartitionedConvolution(num_voices, block, p, max_predelay=64,
                                      ring=ring)
    spectra = bank.partitioned_spectra(block)
    return ref, fm, spectra, bank


@pytest.mark.parametrize("ring", [False, True])
def test_fmajor_equals_coef_engine_steady(ring):
    ref, fm, spectra, _ = build(ring=ring)
    cp = ControlPlane(4, 3, max_predelay=64)
    cp.wet[:] = 0.8
    cp.dry[:] = 0.2
    cp.predelay[:] = 17
    cp.level[:] = 0.9
    cp.pan_wet[:] = [[0.3, -0.4]] * 4
    cp.select[:] = [[0, 1], [1, 2], [2, 0], [0, 0]]
    params = jax.tree.map(jnp.asarray, cp.snapshot())

    s_ref = ref.init_converged(jnp.asarray(spectra), params)
    s_fm = fm.init_converged(fm.prepare_bank(spectra), params)
    bank_fm = fm.prepare_bank(spectra)
    rng = np.random.default_rng(1)
    for t in range(12):
        x = jnp.asarray(rng.standard_normal((4, 2, 32)).astype(np.float32) * 0.05)
        s_ref, o_ref = ref.step_coef(s_ref, jnp.asarray(spectra), params, x)
        s_fm, o_fm = fm.step_coef(s_fm, bank_fm, params, x)
        np.testing.assert_allclose(np.asarray(o_fm), np.asarray(o_ref),
                                   atol=2e-5, err_msg=f"block {t}")


@pytest.mark.parametrize("ring", [False, True])
def test_fmajor_equals_coef_engine_through_fade_and_collapse(ring):
    """Roll mode stores the fade snapshot in f32 and must match the coef
    engine exactly at all times. Ring mode stores it in bfloat16 — a
    DESIGNED transient-only quantization: the base term's weight decays to
    zero, so mid-fade output may differ at bf16 scale (~1e-3 here) but must
    reconverge to exact equality."""
    ref, fm, spectra, _ = build(num_voices=2, ring=ring)
    fade_atol = 2e-3 if ring else 3e-5
    bank_ref = jnp.asarray(spectra)
    bank_fm = fm.prepare_bank(spectra)
    cp = ControlPlane(2, 3, max_predelay=64)
    cp.wet[:] = 0.7
    cp.speed[:] = 6
    cp.dry[:] = 0.1
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    s_ref = ref.init_converged(bank_ref, params)
    s_fm = fm.init_converged(bank_fm, params)

    rng = np.random.default_rng(2)
    for t in range(120):
        if t == 5:
            old = cp.select.copy()
            cp.set_select(0, 0, 2)
            cp.set_select(1, 1, 1)
            changed = jnp.asarray(cp.select != old)
            s_ref = ref.collapse(s_ref, bank_ref, jnp.asarray(old), changed)
            s_fm = fm.collapse(s_fm, bank_fm, jnp.asarray(old), changed)
        if t == 12:
            cp.wet[:] = 0.95  # wet change mid-fade
        params = jax.tree.map(jnp.asarray, cp.snapshot())
        x = jnp.asarray(rng.standard_normal((2, 2, 32)).astype(np.float32) * 0.05)
        s_ref, o_ref = ref.step_coef(s_ref, bank_ref, params, x)
        s_fm, o_fm = fm.step_coef(s_fm, bank_fm, params, x)
        cp.end_block()
        atol = 3e-5 if t < 5 else fade_atol if t < 100 else 5e-5
        np.testing.assert_allclose(np.asarray(o_fm), np.asarray(o_ref),
                                   atol=atol, err_msg=f"block {t}")


def test_fmajor_ring_equals_roll_steady():
    """Ring and roll modes are bit-equivalent whenever no fade is active."""
    _, roll_eng, spectra, _ = build(num_voices=2, ring=False, seed=9)
    _, ring_eng, _, _ = build(num_voices=2, ring=True, seed=9)
    cp = ControlPlane(2, 3, max_predelay=64)
    cp.wet[:] = 0.6
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    b_roll = roll_eng.prepare_bank(spectra)
    b_ring = ring_eng.prepare_bank(spectra)
    s_roll = roll_eng.init_converged(b_roll, params)
    s_ring = ring_eng.init_converged(b_ring, params)
    rng = np.random.default_rng(10)
    for t in range(2 * roll_eng.pp + 5):  # wrap the ring pointer twice
        x = jnp.asarray(rng.standard_normal((2, 2, 32)).astype(np.float32) * 0.05)
        s_roll, o_roll = roll_eng.step_coef_steady(s_roll, b_roll, params, x)
        s_ring, o_ring = ring_eng.step_coef_steady(s_ring, b_ring, params, x)
        np.testing.assert_allclose(np.asarray(o_ring), np.asarray(o_roll),
                                   atol=3e-5, err_msg=f"block {t}")


def test_fmajor_steady_equals_full_when_converged():
    ref, fm, spectra, _ = build(num_voices=2)
    bank_fm = fm.prepare_bank(spectra)
    cp = ControlPlane(2, 3, max_predelay=64)
    cp.wet[:] = 0.5
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = fm.init_converged(bank_fm, params)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 2, 32)).astype(np.float32) * 0.1)
    _, o_full = fm.step_coef(state, bank_fm, params, x)
    _, o_steady = fm.step_coef_steady(state, bank_fm, params, x)
    np.testing.assert_allclose(np.asarray(o_full), np.asarray(o_steady),
                               atol=1e-7)


def test_fmajor_bank_geometry_validation():
    _, fm, spectra, _ = build()
    with pytest.raises(ValueError):
        fm.prepare_bank(spectra[:, :, :-1])


def test_fmajor_in_stream_session():
    """The fmajor engine must plug into StreamSession (duck-typed coef
    interface) including MIDI-triggered collapse."""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import MidiSchedule, StreamSession

    ref, fm, spectra, bank = build(num_voices=1, num_irs=2, ir_len=128)
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    cp.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    cp.speed[:] = 4

    rng = np.random.default_rng(4)
    n_blocks = 100
    x = (rng.standard_normal((1, 2, 32 * n_blocks)) * 0.05).astype(np.float32)
    source = WavSource(x, num_voices=1, block=32)
    sink = WavSink("/dev/null", keep_data=True)
    session = StreamSession(fm, fm.prepare_bank(spectra), cp, source, sink,
                            warmup=0)
    midi = MidiSchedule([(10, "", bytes([0xB0, 0x15, 64]))])
    state = fm.init_converged(session.bank, jax.tree.map(jnp.asarray, cp.snapshot()))
    session.run(state, midi=midi)
    got = sink.data

    from scipy.signal import fftconvolve
    ir = bank.ir(1)
    tail = slice(-32 * 4, None)
    for o in range(2):
        want = np.clip((fftconvolve(x[0, 0], ir[o])
                        + fftconvolve(x[0, 1], ir[o]))[: 32 * n_blocks], -1, 1)
        np.testing.assert_allclose(got[0, o][tail], want[tail], atol=1e-3)


@pytest.mark.parametrize("ring", [False, True])
def test_selected_strategy_equals_allk(ring):
    """'selected' (per-voice materialized spectra) must equal 'allk' exactly
    through steady blocks, a re-select + fade, and a wet change."""
    rng = np.random.default_rng(21)
    bank = IRBank()
    for _ in range(3):
        ir = rng.standard_normal((2, 200)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    p = bank.max_partitions(32)
    spectra = bank.partitioned_spectra(32)
    allk = FMajorPartitionedConvolution(2, 32, p, max_predelay=64, ring=ring,
                                        mac_strategy="allk")
    sel = FMajorPartitionedConvolution(2, 32, p, max_predelay=64, ring=ring,
                                       mac_strategy="selected")
    b_a = allk.prepare_bank(spectra)
    b_s = sel.prepare_bank(spectra)

    cp = ControlPlane(2, 3, max_predelay=64)
    cp.wet[:] = 0.7
    cp.speed[:] = 6
    cp.dry[:] = 0.1
    cp.select[:] = [[0, 1], [2, 0]]
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    s_a = allk.init_converged(b_a, params)
    s_s = sel.init_converged(b_s, params)

    for t in range(40):
        if t == 8:
            old = cp.select.copy()
            cp.set_select(0, 0, 2)
            cp.set_select(1, 1, 1)
            changed = jnp.asarray(cp.select != old)
            new = jnp.asarray(cp.select.copy())
            s_a = allk.collapse(s_a, b_a, jnp.asarray(old), changed)
            s_s = sel.collapse(s_s, b_s, jnp.asarray(old), changed,
                               new_select=new)
        if t == 20:
            cp.wet[:] = 0.9
        params = jax.tree.map(jnp.asarray, cp.snapshot())
        x = jnp.asarray(rng.standard_normal((2, 2, 32)).astype(np.float32) * 0.05)
        s_a, o_a = allk.step_coef(s_a, b_a, params, x)
        s_s, o_s = sel.step_coef(s_s, b_s, params, x)
        cp.end_block()
        np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_a),
                                   atol=3e-5, err_msg=f"block {t}")


def test_auto_strategy_selection():
    p = 8
    eng_small = FMajorPartitionedConvolution(1, 32, p, mac_strategy="auto",
                                             num_irs=4)
    eng_big = FMajorPartitionedConvolution(1, 32, p, mac_strategy="auto",
                                           num_irs=152)
    assert eng_small.mac_strategy == "allk"
    assert eng_big.mac_strategy == "selected"
    with pytest.raises(ValueError):
        FMajorPartitionedConvolution(1, 32, p, mac_strategy="auto")


def test_bf16_mode_snr():
    """The opt-in bf16 wet path must track the f32 engine with > 40 dB SNR
    (8-bit-mantissa quantization of input + IR spectra; dry path stays f32)."""
    rng = np.random.default_rng(33)
    bank = IRBank()
    for _ in range(2):
        ir = rng.standard_normal((2, 400)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    p = bank.max_partitions(64)
    spectra = bank.partitioned_spectra(64)
    kwargs = dict(max_predelay=64)
    f32_eng = FMajorPartitionedConvolution(2, 64, p, **kwargs)
    b16_eng = FMajorPartitionedConvolution(2, 64, p, mac_dtype="bf16", **kwargs)
    b_f = f32_eng.prepare_bank(spectra)
    b_h = b16_eng.prepare_bank(spectra)
    cp = ControlPlane(2, 2, max_predelay=64)
    cp.wet[:] = 1.0
    cp.dry[:] = 0.0
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    s_f = f32_eng.init_converged(b_f, params)
    s_h = b16_eng.init_converged(b_h, params)
    outs_f, outs_h = [], []
    for _ in range(20):
        x = jnp.asarray(rng.standard_normal((2, 2, 64)).astype(np.float32) * 0.05)
        s_f, o_f = f32_eng.step_coef_steady(s_f, b_f, params, x)
        s_h, o_h = b16_eng.step_coef_steady(s_h, b_h, params, x)
        outs_f.append(np.asarray(o_f))
        outs_h.append(np.asarray(o_h))
    ref = np.concatenate(outs_f, -1)
    got = np.concatenate(outs_h, -1)
    err = got - ref
    snr_db = 10 * np.log10((ref ** 2).mean() / max((err ** 2).mean(), 1e-30))
    assert snr_db > 40.0, snr_db


@pytest.mark.parametrize("ring", [False, True])
def test_bf16_selected_strategy_state_stable(ring):
    """bf16 + selected strategy: state dtypes must stay stable through
    collapse (a dtype flip would retrigger compilation / break donation)."""
    rng = np.random.default_rng(41)
    bank = IRBank()
    for _ in range(2):
        ir = rng.standard_normal((2, 128)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    p = bank.max_partitions(32)
    eng = FMajorPartitionedConvolution(1, 32, p, max_predelay=64, ring=ring,
                                       mac_strategy="selected",
                                       mac_dtype="bf16")
    bank_d = eng.prepare_bank(bank.partitioned_spectra(32))
    cp = ControlPlane(1, 2, max_predelay=64)
    cp.wet[:] = 1.0
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = eng.init_converged(bank_d, params)
    dtypes0 = jax.tree.map(lambda l: l.dtype, state)
    old = cp.select.copy()
    cp.set_select(0, 0, 1)
    state = eng.collapse(state, bank_d, jnp.asarray(old),
                         jnp.asarray(cp.select != old),
                         new_select=jnp.asarray(cp.select))
    assert jax.tree.map(lambda l: l.dtype, state) == dtypes0
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    x = jnp.asarray(rng.standard_normal((1, 2, 32)).astype(np.float32) * 0.1)
    state, out = eng.step_coef(state, bank_d, params, x)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("ring", [False, True])
def test_indexed_fade_matches_general_fade(ring):
    """step_coef_indexed after collapse_pure (no snapshot rewrite; base term
    taken from the all-K MAC via state provenance) must match step_coef
    after the materializing collapse — the two representations of the same
    converged re-select."""
    _, fm, spectra, _ = build(num_voices=4, ring=ring)
    bank_fm = fm.prepare_bank(spectra)
    cp = ControlPlane(4, 3, max_predelay=64)
    cp.wet[:] = 0.8
    cp.dry[:] = 0.1
    cp.predelay[:] = 9
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state0 = fm.init_converged(bank_fm, params)  # coef_c == wet, coef_a == 0

    # converged re-select: effective snapshot becomes coef_c * bank[old]
    old = cp.select.copy()
    cp.select[:] = [[2, 1], [0, 2], [1, 1], [2, 0]]
    cp.vsteps[:] = 6
    changed = jnp.asarray(np.ones_like(old, bool))
    s_gen = jax.jit(fm.collapse)(state0, bank_fm, jnp.asarray(old), changed)
    s_idx = jax.jit(fm.collapse_pure)(state0, jnp.asarray(old), changed)
    assert bool(np.asarray(s_idx.base_pure).all())
    # span provenance: g == coef_c * onehot(old) for a converged re-select
    np.testing.assert_allclose(np.asarray(s_idx.base_g),
                               0.8 * np.eye(3, dtype=np.float32)[old])

    atol = 2e-3 if ring else 3e-6  # ring-mode base snapshot is bf16
    rng = np.random.default_rng(4)
    step_gen = jax.jit(fm.step_coef, donate_argnums=())
    step_idx = jax.jit(fm.step_coef_indexed, donate_argnums=())
    for t in range(10):
        params = jax.tree.map(jnp.asarray, cp.snapshot())
        x = jnp.asarray(rng.standard_normal((4, 2, 32)).astype(np.float32) * 0.05)
        s_gen, o_gen = step_gen(s_gen, bank_fm, params, x)
        s_idx, o_idx = step_idx(s_idx, bank_fm, params, x)
        np.testing.assert_allclose(np.asarray(o_idx), np.asarray(o_gen),
                                   atol=atol, err_msg=f"block {t}")
        cp.end_block()


@pytest.mark.parametrize("ring", [False, True])
def test_materializing_collapse_honors_virtual_snapshot(ring):
    """An INTERRUPTED fade after a collapse_pure: the materializing
    collapse must reconstruct the virtual snapshot (gain * bank[sel], whose
    `base` tensor is stale) before folding it into the mixture — the
    deferred-collapse trajectory must equal the always-materializing one."""
    _, fm, spectra, _ = build(num_voices=2, ring=ring)
    bank_fm = fm.prepare_bank(spectra)
    cp = ControlPlane(2, 3, max_predelay=64)
    cp.wet[:] = 0.8
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state0 = fm.init_converged(bank_fm, params)

    collapse = jax.jit(fm.collapse, donate_argnums=())
    collapse_pure = jax.jit(fm.collapse_pure, donate_argnums=())
    step = jax.jit(fm.step_coef, donate_argnums=())
    step_idx = jax.jit(fm.step_coef_indexed, donate_argnums=())
    rng = np.random.default_rng(6)

    def fade_then_interrupt(state, deferred):
        cpl = ControlPlane(2, 3, max_predelay=64)
        cpl.wet[:] = 0.8
        # re-select 0 -> 1 (converged start), fade 3 blocks, interrupt -> 2
        old = cpl.select.copy()
        cpl.select[:] = 1
        cpl.vsteps[:] = 20
        changed = jnp.asarray(np.ones_like(old, bool))
        if deferred:
            state = collapse_pure(state, jnp.asarray(old), changed)
        else:
            state = collapse(state, bank_fm, jnp.asarray(old), changed)
        outs = []
        rng2 = np.random.default_rng(7)
        for t in range(3):
            p = jax.tree.map(jnp.asarray, cpl.snapshot())
            x = jnp.asarray(rng2.standard_normal((2, 2, 32)).astype(np.float32) * 0.05)
            state, o = (step_idx if deferred else step)(state, bank_fm, p, x)
            outs.append(np.asarray(o))
            cpl.end_block()
        old = cpl.select.copy()
        cpl.select[:] = 2  # interrupt mid-fade -> mixture
        cpl.vsteps[:] = 20
        state = collapse(state, bank_fm, jnp.asarray(old), changed)
        for t in range(6):
            p = jax.tree.map(jnp.asarray, cpl.snapshot())
            x = jnp.asarray(rng2.standard_normal((2, 2, 32)).astype(np.float32) * 0.05)
            state, o = step(state, bank_fm, p, x)
            outs.append(np.asarray(o))
            cpl.end_block()
        return np.concatenate(outs, axis=-1)

    got_deferred = fade_then_interrupt(state0, deferred=True)
    got_material = fade_then_interrupt(state0, deferred=False)
    atol = 4e-3 if ring else 3e-6  # bf16 snapshot transient in ring mode
    np.testing.assert_allclose(got_deferred, got_material, atol=atol)


@pytest.mark.parametrize("ring", [False, True])
def test_span_collapse_carries_interrupted_fades(ring):
    """An INTERRUPTED fade stays in the bank's span: collapse_pure applies
    the affine re-base to the span coefficients mid-fade (g := a*g +
    c*onehot(old)) and the indexed step keeps serving every block at steady
    cost — the trajectory must match the materializing collapse + general
    step through repeated interruptions (growing the span to full rank)."""
    _, fm, spectra, _ = build(num_voices=2, ring=ring)
    bank_fm = fm.prepare_bank(spectra)
    cp0 = ControlPlane(2, 3, max_predelay=64)
    cp0.wet[:] = 0.8
    params = jax.tree.map(jnp.asarray, cp0.snapshot())
    state0 = fm.init_converged(bank_fm, params)

    collapse = jax.jit(fm.collapse, donate_argnums=())
    collapse_pure = jax.jit(fm.collapse_pure, donate_argnums=())
    step = jax.jit(fm.step_coef, donate_argnums=())
    step_idx = jax.jit(fm.step_coef_indexed, donate_argnums=())

    def run(state, span):
        cpl = ControlPlane(2, 3, max_predelay=64)
        cpl.wet[:] = 0.8
        outs = []
        rng2 = np.random.default_rng(9)
        changed = jnp.asarray(np.ones((2, 2), bool))

        def reselect(state, new):
            old = cpl.select.copy()
            cpl.select[:] = new
            cpl.vsteps[:] = 20
            if span:
                return collapse_pure(state, jnp.asarray(old), changed)
            return collapse(state, bank_fm, jnp.asarray(old), changed)

        def blocks(state, n):
            for _ in range(n):
                p = jax.tree.map(jnp.asarray, cpl.snapshot())
                x = jnp.asarray(rng2.standard_normal((2, 2, 32))
                                .astype(np.float32) * 0.05)
                state, o = (step_idx if span else step)(state, bank_fm, p, x)
                outs.append(np.asarray(o))
                cpl.end_block()
            return state

        state = reselect(state, 1)   # converged start
        state = blocks(state, 3)
        state = reselect(state, 2)   # interrupt #1: 2-entry mixture
        state = blocks(state, 3)
        state = reselect(state, 0)   # interrupt #2: full-rank span
        state = blocks(state, 8)
        return np.concatenate(outs, axis=-1)

    got_span = run(state0, span=True)
    got_material = run(state0, span=False)
    atol = 4e-3 if ring else 3e-6  # the MATERIALIZED path is bf16 in ring
    np.testing.assert_allclose(got_span, got_material, atol=atol)


def test_indexed_fade_requires_allk():
    _, fm, spectra, _ = build(num_voices=2)
    fm.mac_strategy = "selected"
    with pytest.raises(ValueError):
        fm.step_coef_indexed(None, None, None, None)


def test_session_uses_indexed_fade_and_matches_general():
    """A live session whose fades always start from converged state must
    route crossfading blocks through the indexed step (same cost as steady)
    and produce the same audio as the general fade path."""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import MidiSchedule

    def build_model():
        rng = np.random.default_rng(7)
        bank = IRBank()
        for _ in range(3):
            ir = rng.standard_normal((2, 220)).astype(np.float32)
            bank.append(ir * (0.4 / np.abs(ir).max()))
        m = ConvolutionReverb(bank, num_voices=2, block=64, engine="fmajor",
                              max_predelay=128)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
        m.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
        m.control.wet[:] = 0.9
        m.control.dry[:] = 0.1
        m.control.speed[:] = 8
        return m

    rng = np.random.default_rng(8)
    x = (rng.standard_normal((2, 2, 64 * 30)) * 0.05).astype(np.float32)
    # two re-selects, each starting well after the previous fade converged
    midi = lambda: MidiSchedule([(4, "", bytes([0xB0, 0x15, 64])),
                                 (20, "", bytes([0xB0, 0x15, 127]))])

    m1 = build_model()
    s1 = WavSink("/dev/null", keep_data=True)
    sess1 = m1.session(WavSource(x, 2, 64), s1, warmup=0)
    assert sess1._step_indexed is not None
    sess1.run(m1.init_state(), midi=midi())
    assert getattr(sess1, "indexed_blocks", 0) >= 10  # fades rode the fast path

    m2 = build_model()
    s2 = WavSink("/dev/null", keep_data=True)
    sess2 = m2.session(WavSource(x, 2, 64), s2)
    sess2._step_indexed = None  # force the general fade path
    sess2.run(m2.init_state(), midi=midi())
    assert getattr(sess2, "indexed_blocks", 0) == 0

    # ring mode stores the general path's fade snapshot in bf16; the indexed
    # path reads the exact f32 bank instead, so mid-fade blocks agree only
    # to bf16 scale (the indexed path is the MORE exact of the two)
    np.testing.assert_allclose(s1.data, s2.data, atol=4e-3)


def test_session_interrupted_fade_stays_indexed():
    """A re-select landing mid-fade keeps span provenance (the affine
    re-base stays in the bank's span), so the session keeps routing every
    crossfading block through the indexed step — no fallback — and still
    matches the general-path session within the bf16-snapshot tolerance
    (the general path's ring-mode base is bf16; the span path reads the
    exact f32 bank)."""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import MidiSchedule

    def build_model():
        rng = np.random.default_rng(9)
        bank = IRBank()
        for _ in range(3):
            ir = rng.standard_normal((2, 180)).astype(np.float32)
            bank.append(ir * (0.4 / np.abs(ir).max()))
        m = ConvolutionReverb(bank, num_voices=1, block=64, engine="fmajor",
                              max_predelay=128)
        m.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
        m.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
        m.control.wet[:] = 0.8
        m.control.speed[:] = 50  # slow fade, interrupted below
        return m

    rng = np.random.default_rng(10)
    x = (rng.standard_normal((1, 2, 64 * 20)) * 0.05).astype(np.float32)
    midi = lambda: MidiSchedule([(2, "", bytes([0xB0, 0x15, 64])),
                                 (6, "", bytes([0xB0, 0x15, 127]))])

    m1 = build_model()
    s1 = WavSink("/dev/null", keep_data=True)
    sess1 = m1.session(WavSource(x, 1, 64), s1)
    sess1.run(m1.init_state(), midi=midi())
    # BOTH fades ride the indexed step, through the interrupt at block 6
    assert getattr(sess1, "indexed_blocks", 0) >= 12

    m2 = build_model()
    s2 = WavSink("/dev/null", keep_data=True)
    sess2 = m2.session(WavSource(x, 1, 64), s2)
    sess2._step_indexed = None
    sess2.run(m2.init_state(), midi=midi())
    # fade 1 rode the indexed path (exact f32 bank) vs bf16 snapshot: see
    # test_session_uses_indexed_fade_and_matches_general
    np.testing.assert_allclose(s1.data, s2.data, atol=4e-3)


def test_swap_bank_mid_pure_fade_keeps_old_tail():
    """swap_bank during a deferred-collapse (virtual snapshot) fade must
    materialize the snapshot against the OLD bank first: the fade-out tail
    keeps the old sound even though the new bank replaces the select term.
    (Swapping to a silent bank makes the bug binary: without
    materialization the wet output goes instantly silent.)"""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.backends import WavSink, WavSource

    rng = np.random.default_rng(61)
    bank = IRBank()
    for _ in range(2):
        ir = rng.standard_normal((2, 200)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    model = ConvolutionReverb(bank, num_voices=1, block=64, max_predelay=64)
    model.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    model.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
    model.control.wet[:] = 1.0
    model.control.dry[:] = 0.0
    model.control.speed[:] = 200  # very slow fade: a stays ~1 for a while

    x = (rng.standard_normal((1, 2, 64 * 16)) * 0.1).astype(np.float32)
    from tpu_audio.runtime.stream import MidiSchedule
    sess = model.session(WavSource(x[..., : 64 * 6], 1, 64),
                         WavSink("/dev/null", keep_data=True), warmup=0,
                         donate=False)
    state = sess.run(model.init_state(),
                     midi=MidiSchedule([(2, "", bytes([0xB0, 0x15, 64]))]))
    assert getattr(sess, "indexed_blocks", 0) >= 1  # deferred collapse ran
    assert bool(np.asarray(state.base_pure).all())

    silent = IRBank()
    for _ in range(2):
        silent.append(np.zeros((2, 200), np.float32))
    sess.swap_bank(model.engine.prepare_bank(silent.partitioned_spectra(64)))
    sink2 = WavSink("/dev/null", keep_data=True)
    sess.sink = sink2
    sess.source = WavSource(x[..., 64 * 6:], 1, 64)
    sess.run(state)
    # the old bank's fade-out tail must still be audible right after the
    # swap (a ~ 0.97 here); a stale-virtual read of the silent bank yields
    # near-silence instead
    first = sink2.data[..., : 64 * 2]
    assert np.abs(first).max() > 1e-2, "fade tail vanished on bank swap"


def test_swap_bank_mid_interrupted_fade_keeps_old_mixture():
    """swap_bank after an INTERRUPTED fade: the span snapshot is a genuine
    mixture (g spans two bank entries); the swap must materialize
    sum_k g[k] * old_bank[k] before switching, so the mixed fade-out tail
    keeps the old sound. Swapping to a silent bank makes it binary."""
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import MidiSchedule

    rng = np.random.default_rng(62)
    bank = IRBank()
    for _ in range(3):
        ir = rng.standard_normal((2, 200)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    model = ConvolutionReverb(bank, num_voices=1, block=64, max_predelay=64)
    model.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    model.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
    model.control.wet[:] = 1.0
    model.control.dry[:] = 0.0
    model.control.speed[:] = 200  # very slow fades: both stay in flight

    x = (rng.standard_normal((1, 2, 64 * 16)) * 0.1).astype(np.float32)
    sess = model.session(WavSource(x[..., : 64 * 6], 1, 64),
                         WavSink("/dev/null", keep_data=True), warmup=0,
                         donate=False)
    # re-select at 2, interrupt at 4 -> span mixture of entries 0 and 1
    state = sess.run(model.init_state(),
                     midi=MidiSchedule([(2, "", bytes([0xB0, 0x15, 64])),
                                        (4, "", bytes([0xB0, 0x15, 127]))]))
    assert bool(np.asarray(state.base_pure).all())
    g = np.asarray(state.base_g)
    assert (np.abs(g) > 1e-4).sum() >= 2, f"expected a mixture, got {g}"

    silent = IRBank()
    for _ in range(3):
        silent.append(np.zeros((2, 200), np.float32))
    sess.swap_bank(model.engine.prepare_bank(silent.partitioned_spectra(64)))
    sink2 = WavSink("/dev/null", keep_data=True)
    sess.sink = sink2
    sess.source = WavSource(x[..., 64 * 6:], 1, 64)
    state = sess.run(state)
    assert not bool(np.asarray(state.base_pure).any())  # materialized
    first = sink2.data[..., : 64 * 2]
    assert np.abs(first).max() > 1e-2, "mixed fade tail vanished on swap"


def _snapshot_flag_model(swap_snapshot, num_irs=3, seed=63):
    from tpu_audio.engine.params import CCMapping
    from tpu_audio.models.reverb import ConvolutionReverb

    rng = np.random.default_rng(seed)
    bank = IRBank()
    for _ in range(num_irs):
        ir = rng.standard_normal((2, 200)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    m = ConvolutionReverb(bank, num_voices=2, block=64, max_predelay=64,
                          swap_snapshot=swap_snapshot)
    m.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    m.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
    m.control.wet[:] = 0.9
    m.control.dry[:] = 0.1
    m.control.speed[:] = 30
    return m


def test_snapshotless_engine_matches_snapshot_engine():
    """swap_snapshot=False drops the materialized base tensor (the largest
    state array); every fade rides the span path, so a session with
    interrupted re-selects must produce BIT-IDENTICAL output to the
    snapshot-carrying engine (whose base is dead weight on this path)."""
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import MidiSchedule

    rng = np.random.default_rng(64)
    x = (rng.standard_normal((2, 2, 64 * 24)) * 0.05).astype(np.float32)
    # second select lands mid-fade (speed 30): an interrupted fade
    midi = lambda: MidiSchedule([(2, "", bytes([0xB0, 0x15, 64])),
                                 (6, "", bytes([0xB0, 0x15, 127]))])

    outs = {}
    for flag in (True, False):
        m = _snapshot_flag_model(flag)
        assert m.engine.swap_snapshot is flag
        sink = WavSink("/dev/null", keep_data=True)
        sess = m.session(WavSource(x, 2, 64), sink, warmup=0)
        sess.run(m.init_state(), midi=midi())
        assert getattr(sess, "indexed_blocks", 0) >= 12
        outs[flag] = sink.data
    base_elems = int(np.prod(_snapshot_flag_model(False)
                             .engine._base_shape()[0]))
    assert base_elems == 1  # the snapshot really is gone
    np.testing.assert_array_equal(outs[True], outs[False])


def test_snapshotless_swap_defers_until_fades_decay():
    """A span-only engine cannot materialize old-bank tails, so swap_bank
    waits for in-flight crossfades to decay: the old bank keeps sounding
    through the fade, then the (silent) new bank applies and the output
    dies out."""
    from tpu_audio.runtime.backends import WavSink, WavSource
    from tpu_audio.runtime.stream import MidiSchedule

    m = _snapshot_flag_model(False, seed=65)
    m.control.dry[:] = 0.0
    m.control.speed[:] = 8  # fade decays below threshold in ~70 blocks
    rng = np.random.default_rng(66)
    x = (rng.standard_normal((2, 2, 64 * 110)) * 0.1).astype(np.float32)
    # end input early so the tail region is engine output only
    x[..., 64 * 100:] = 0.0

    silent = IRBank()
    for _ in range(3):
        silent.append(np.zeros((2, 200), np.float32))
    sink = WavSink("/dev/null", keep_data=True)
    sess = m.session(WavSource(x[..., : 64 * 6], 2, 64), sink, warmup=0,
                     donate=False)
    # start the fade first (select at block 2), THEN request the swap
    state = sess.run(m.init_state(),
                     midi=MidiSchedule([(2, "", bytes([0xB0, 0x15, 64]))]))
    assert (np.asarray(state.coef_a)[0] > 1e-3).all(), "fade must be in flight"
    sess.swap_bank(m.engine.prepare_bank(silent.partitioned_spectra(64)))
    sink2 = WavSink("/dev/null", keep_data=True)
    sess.sink = sink2
    sess.source = WavSource(x[..., 64 * 6:], 2, 64)
    sess.run(state)
    assert sess._pending_bank is None, "swap never applied"
    mid = sink2.data[..., : 64 * 30]
    assert np.abs(mid).max() > 1e-3, "old bank fell silent during the fade"
    tail = sink2.data[..., -64 * 2:]
    assert np.abs(tail).max() < 1e-4, "silent bank did not take over"


@pytest.mark.parametrize("strategy", ["selected", "allk"])
@pytest.mark.parametrize("ring", [False, True])
def test_pv_mac_merged_matches_dot(ring, strategy):
    """pv_mac='merged' (channel axis folded into the matmul dims, i-cross
    terms discarded) must match the default dot lowering bit-for-bit-ish
    through steady + fading blocks on both MAC strategies."""
    from tpu_audio.engine.fmajor import FMajorPartitionedConvolution

    _, fm_ref, spectra, _ = build(num_voices=2, ring=ring)
    engines = {}
    for pv in ("dot", "merged"):
        engines[pv] = FMajorPartitionedConvolution(
            2, 32, fm_ref.partitions, max_predelay=64, ring=ring,
            mac_strategy=strategy, pv_mac=pv)
    cp = ControlPlane(2, 3, max_predelay=64)
    cp.wet[:] = 0.8
    cp.dry[:] = 0.1
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    rng = np.random.default_rng(71)
    outs = {}
    for pv, eng in engines.items():
        bank_d = eng.prepare_bank(spectra)
        state = eng.init_converged(bank_d, params)
        # enter a fade through the materializing collapse so the general
        # (per-voice) path runs with a real base snapshot
        old = cp.select.copy()
        cpl = ControlPlane(2, 3, max_predelay=64)
        cpl.wet[:] = 0.8
        cpl.dry[:] = 0.1
        cpl.select[:] = 1
        cpl.vsteps[:] = 12
        changed = jnp.asarray(np.ones_like(old, bool))
        kw = (dict(new_select=jnp.asarray(cpl.select))
              if strategy == "selected" else {})
        state = jax.jit(eng.collapse, donate_argnums=())(
            state, bank_d, jnp.asarray(old), changed, **kw)
        step = jax.jit(eng.step_coef, donate_argnums=())
        rng2 = np.random.default_rng(72)
        chunks = []
        for _ in range(6):
            p = jax.tree.map(jnp.asarray, cpl.snapshot())
            x = jnp.asarray(rng2.standard_normal((2, 2, 32))
                            .astype(np.float32) * 0.05)
            state, o = step(state, bank_d, p, x)
            chunks.append(np.asarray(o))
            cpl.end_block()
        outs[pv] = np.concatenate(chunks, axis=-1)
    np.testing.assert_allclose(outs["merged"], outs["dot"], atol=2e-6)


def test_snapshotless_guards():
    from tpu_audio.engine.fmajor import FMajorPartitionedConvolution

    with pytest.raises(ValueError, match="allk"):
        FMajorPartitionedConvolution(1, 32, 4, mac_strategy="selected",
                                     swap_snapshot=False)
    _, fm, spectra, _ = build(num_voices=1)
    fm2 = FMajorPartitionedConvolution(1, 32, fm.partitions,
                                       max_predelay=64, swap_snapshot=False)
    bank_d = fm2.prepare_bank(spectra)
    cp = ControlPlane(1, 3, max_predelay=64)
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = fm2.init_converged(bank_d, params)
    with pytest.raises(ValueError, match="swap_snapshot"):
        fm2.step_coef(state, bank_d, params, jnp.zeros((1, 2, 32)))
    with pytest.raises(ValueError, match="swap_snapshot"):
        fm2.collapse(state, bank_d, jnp.asarray(cp.select),
                     jnp.zeros((1, 2), bool))
    # steady and span-fade steps work without the snapshot
    state, out = jax.jit(fm2.step_coef_steady)(state, bank_d, params,
                                               jnp.zeros((1, 2, 32)))
    state, out = jax.jit(fm2.step_coef_indexed)(state, bank_d, params,
                                                jnp.zeros((1, 2, 32)))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("ring", [False, True])
@pytest.mark.parametrize("strategy", ["allk", "selected"])
def test_device_bank_pack_matches_numpy(ring, strategy):
    """prepare_bank derives MAC tensors ON DEVICE; they must equal the
    numpy reference packing (pack_mac_rhs/double_reversed/
    pack_spectra_rev2) bit for bit in every mode/strategy combination."""
    from tpu_audio.engine.fmajor import (double_reversed, pack_mac_rhs,
                                         pack_planar_spectra,
                                         pack_spectra_rev2)

    _, _, spectra, _ = build(ring=ring)
    fm = FMajorPartitionedConvolution(4, 32, spectra.shape[2],
                                      max_predelay=64, ring=ring,
                                      mac_strategy=strategy,
                                      num_irs=spectra.shape[0])
    dev = fm.prepare_bank(spectra)
    if ring:
        # ring mode never reads the planar spectra (gather/span-expand use
        # spectra_rev2): the leaf stays a placeholder — no dead HBM/upload
        assert dev.spectra.shape == (1, 1, 1, 1, 1)
        assert dev.num_irs == spectra.shape[0]
    else:
        np.testing.assert_array_equal(np.asarray(dev.spectra),
                                      pack_planar_spectra(spectra, fm.pp))
    if strategy == "allk":
        mac = pack_mac_rhs(spectra, fm.pp)
        if ring:
            np.testing.assert_array_equal(np.asarray(dev.rhs2),
                                          double_reversed(mac, axis=2))
        else:
            np.testing.assert_array_equal(np.asarray(dev.mac_rhs), mac)
    if ring:
        np.testing.assert_array_equal(np.asarray(dev.spectra_rev2),
                                      pack_spectra_rev2(spectra, fm.pp))


@pytest.mark.parametrize("ring", [False, True])
def test_update_bank_slot_matches_full_prepare(ring):
    """Device-side single-slot packing == re-preparing the whole bank."""
    _, _, spectra, _ = build(ring=ring)
    fm = FMajorPartitionedConvolution(4, 32, spectra.shape[2],
                                      max_predelay=64, ring=ring,
                                      mac_strategy="allk",
                                      num_irs=spectra.shape[0])
    dev = fm.prepare_bank(spectra)
    rng = np.random.default_rng(12)
    newk = (rng.standard_normal((1,) + spectra.shape[1:])
            + 1j * rng.standard_normal((1,) + spectra.shape[1:])
            ).astype(np.complex64)
    updated = fm.update_bank_slot(dev, 1, newk)
    spectra2 = spectra.copy()
    spectra2[1] = newk[0]
    ref = fm.prepare_bank(spectra2)
    for leaf in ("mac_rhs", "rhs2", "spectra", "spectra_rev2"):
        np.testing.assert_array_equal(np.asarray(getattr(updated, leaf)),
                                      np.asarray(getattr(ref, leaf)),
                                      err_msg=leaf)


@pytest.mark.parametrize("ring", [True, False])
@pytest.mark.parametrize("mac_dtype", ["f32", "bf16"])
def test_fault_upload_derived_matches_dual(mac_dtype, ring):
    """fault_upload='derived' (upload only the spectra slot — rev2 in
    ring mode, planar in roll mode — and rebuild the MAC column on
    device) must produce a bank bit-equal to the dual-upload path in
    both MAC dtypes and both delay-line modes."""
    _, _, spectra, _ = build(ring=ring)
    kw = dict(max_predelay=64, ring=ring, mac_strategy="allk",
              num_irs=spectra.shape[0], mac_dtype=mac_dtype)
    fm_dual = FMajorPartitionedConvolution(4, 32, spectra.shape[2], **kw)
    fm_drv = FMajorPartitionedConvolution(4, 32, spectra.shape[2],
                                          fault_upload="derived", **kw)
    rng = np.random.default_rng(13)
    newk = (rng.standard_normal((1,) + spectra.shape[1:])
            + 1j * rng.standard_normal((1,) + spectra.shape[1:])
            ).astype(np.complex64)
    got = fm_drv.update_bank_slot(fm_drv.prepare_bank(spectra), 2, newk)
    want = fm_dual.update_bank_slot(fm_dual.prepare_bank(spectra), 2, newk)
    for leaf in ("mac_rhs", "rhs2", "spectra", "spectra_rev2"):
        np.testing.assert_array_equal(np.asarray(getattr(got, leaf)),
                                      np.asarray(getattr(want, leaf)),
                                      err_msg=leaf)


@pytest.mark.parametrize("strategy", ["allk", "selected"])
def test_materialize_base_equals_no_change_collapse(strategy):
    """materialize_base must be leaf-for-leaf identical to
    collapse(changed=all-False) — the session's bank-swap/resume paths use
    it because the traced all-False form cannot dead-code-eliminate the
    re-select gathers (a full-bank read at 'selected' scale)."""
    _, _, spectra, _ = build()
    fm = FMajorPartitionedConvolution(4, 32, spectra.shape[2],
                                      max_predelay=64,
                                      mac_strategy=strategy,
                                      num_irs=spectra.shape[0])
    bank = fm.prepare_bank(spectra)
    cp = ControlPlane(4, 3, max_predelay=64)
    cp.wet[:] = 0.7
    cp.select[:] = [[0, 1], [1, 2], [2, 0], [0, 0]]
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = fm.init_converged(bank, params)
    if strategy == "allk":
        # a genuinely virtual mid-fade snapshot: span-collapse a re-select
        cp.vsteps[:] = 40
        state = fm.collapse_pure(state, params.select,
                                 jnp.asarray(np.ones((4, 2), bool)))
        assert bool(np.asarray(state.base_pure).all())
    no_change = jnp.asarray(np.zeros((4, 2), bool))
    sel = jnp.asarray(cp.select)
    ref = fm.collapse(state, bank, sel, no_change,
                      sel if strategy == "selected" else None)
    got = fm.materialize_base(state, bank)
    for name in type(state).__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(got, name)),
                                      np.asarray(getattr(ref, name)),
                                      err_msg=name)


def test_materialize_base_guard_span_only():
    _, _, spectra, _ = build()
    fm = FMajorPartitionedConvolution(4, 32, spectra.shape[2],
                                      max_predelay=64, swap_snapshot=False,
                                      num_irs=spectra.shape[0])
    bank = fm.prepare_bank(spectra)
    st = fm.init_state()
    with pytest.raises(ValueError, match="swap_snapshot"):
        fm.materialize_base(st, bank)


def test_pack_cache_hit_and_legacy_npz_migration(tmp_path):
    """prepare_bank's packed-tensor disk cache: a warm hit reproduces the
    uncached bank bit-for-bit, and a legacy .npz entry (pre round-3) is
    migrated once to raw .npy (zipfile reads multi-GB entries at ~5 MB/s;
    np.load+mmap is instant) and produces the same bank."""
    import glob
    import os

    from tpu_audio.utils import diskcache

    _, fm, spectra, _ = build()
    want = fm.prepare_bank(spectra)                       # no cache
    leaves_want = [np.asarray(x) for x in jax.tree.leaves(want)]

    fm2 = FMajorPartitionedConvolution(4, 32, fm.partitions, max_predelay=64)
    got_cold = fm2.prepare_bank(spectra, cache_dir=tmp_path)  # cold: stores
    base = "pack_" + diskcache.content_key(
        "fmajor-pack", (fm2.pp, fm2.ring_mode, fm2.mac_strategy,
                        spectra.shape), np.asarray(spectra))
    assert os.path.exists(tmp_path / f"{base}.ok")
    fm3 = FMajorPartitionedConvolution(4, 32, fm.partitions, max_predelay=64)
    got_warm = fm3.prepare_bank(spectra, cache_dir=tmp_path)  # warm hit
    for g_cold, g_warm, w in zip(jax.tree.leaves(got_cold),
                                 jax.tree.leaves(got_warm),
                                 leaves_want):
        np.testing.assert_array_equal(np.asarray(g_cold), w)
        np.testing.assert_array_equal(np.asarray(g_warm), w)

    # legacy migration: move the stored fields into one .npz, drop the
    # npy entry, and prepare again — must migrate AND re-store as npy
    fields = {}
    for p in glob.glob(str(tmp_path / f"{base}_*.npy")):
        name = os.path.basename(p)[len(base) + 1:-4]
        fields[name] = np.load(p)
        os.remove(p)
    os.remove(tmp_path / f"{base}.ok")
    np.savez(tmp_path / f"{base}.npz", **fields)
    fm4 = FMajorPartitionedConvolution(4, 32, fm.partitions, max_predelay=64)
    got_legacy = fm4.prepare_bank(spectra, cache_dir=tmp_path)
    for g, w in zip(jax.tree.leaves(got_legacy), leaves_want):
        np.testing.assert_array_equal(np.asarray(g), w)
    assert os.path.exists(tmp_path / f"{base}.ok")        # migrated
    assert glob.glob(str(tmp_path / f"{base}_*.npy"))
