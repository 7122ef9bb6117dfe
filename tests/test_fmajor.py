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
