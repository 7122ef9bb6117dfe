"""Working-set IR residency (runtime/working_set.py).

The whole point: with capacity-C slots the engine output must be
IDENTICAL to a full-bank engine whenever the working set suffices —
remapping + slot uploads are invisible to the audio. Eviction must never
touch a slot that is selected or still fading.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_audio.engine import ControlPlane, IRBank
from tpu_audio.engine.fmajor import FMajorPartitionedConvolution
from tpu_audio.engine.params import CCMapping
from tpu_audio.models.reverb import ConvolutionReverb
from tpu_audio.runtime.backends import WavSink, WavSource
from tpu_audio.runtime.stream import MidiSchedule, StreamSession
from tpu_audio.runtime.working_set import WorkingSetBank

B, V, KFULL, CAP = 32, 2, 9, 4
IR_LEN = 300


def make_bank(seed=0, k=KFULL):
    rng = np.random.default_rng(seed)
    bank = IRBank()
    for i in range(k):
        ir = rng.standard_normal((2, IR_LEN)).astype(np.float32)
        bank.append(ir * (0.3 / np.abs(ir).max()))
    return bank


def build_ws(bank, min_age_blocks=0, **kw):
    p = bank.max_partitions(B)
    eng = FMajorPartitionedConvolution(V, B, p, max_predelay=64,
                                       num_irs=CAP, mac_strategy="allk")
    full = bank.partitioned_spectra(B, max_partitions=p)
    cp = ControlPlane(V, KFULL, max_predelay=64)
    cp.wet[:] = 0.8
    cp.dry[:] = 0.1
    dev = eng.prepare_bank(full[list(range(CAP))])
    ws = WorkingSetBank(eng, cp, lambda k: full[k: k + 1], dev,
                        list(range(CAP)), min_age_blocks=min_age_blocks,
                        **kw)
    return eng, cp, ws, full


def test_hit_miss_and_eviction_order():
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank)
    cp.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    # CC value -> full index value*K//128; pick values hitting ids 0 and 7
    assert cp.apply_cc(0, 0, 0xB0, 0x15, 0)          # full 0: resident hit
    assert ws.misses == 0 and cp.select[0, 0] == 0
    assert cp.apply_cc(0, 0, 0xB0, 0x15, 100)        # full 7: miss
    assert ws.misses == 1
    slot7 = int(cp.select[0, 0])
    assert ws.slot_to_full[slot7] == 7
    # the evicted slot was the least-recently-used non-selected one
    assert 7 in ws.full_to_slot
    # re-select 7: hit, no upload
    assert cp.apply_cc(0, 0, 0xB0, 0x15, 101)        # still full 7
    assert ws.misses == 1 and ws.hits >= 1


def test_exhaustion_raises():
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank, min_age_blocks=100,
                                 on_exhausted="raise")
    cp.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    cp.set_mapping(0, 1, CCMapping(message=0xB0, select=0x16))
    cp.set_mapping(1, 0, CCMapping(message=0xB0, select=0x17))
    cp.set_mapping(1, 1, CCMapping(message=0xB0, select=0x18))
    # pin all 4 slots via current selections (touch each resident)
    cp.apply_cc(0, 0, 0xB0, 0x15, 0)    # full 0
    cp.apply_cc(0, 1, 0xB0, 0x16, 15)   # full 1
    cp.apply_cc(1, 0, 0xB0, 0x17, 29)   # full 2
    cp.apply_cc(1, 1, 0xB0, 0x18, 43)   # full 3
    with pytest.raises(RuntimeError, match="working set exhausted"):
        cp.apply_cc(0, 0, 0xB0, 0x15, 100)  # a 5th distinct IR
    # free full-3's slot by converging (1,1) onto full 2, age past the
    # fade-protection window (process blocks), and the fault succeeds
    cp.apply_cc(1, 1, 0xB0, 0x18, 29)       # (1,1) -> full 2 (hit)
    for _ in range(1000):
        cp.end_block()
    assert cp.apply_cc(0, 0, 0xB0, 0x15, 100)
    assert ws.misses == 1
    assert ws.slot_to_full[int(cp.select[0, 0])] == 100 * KFULL // 128


def test_hook_registration_by_mode():
    """Async paging AND the defer policy each need the between-blocks
    poll and the pre-checkpoint drain; sync+raise registers neither (the
    hot loop pays no hook). Regression: moving the drain registration
    into a defer-only branch silently dropped async checkpoint draining."""
    bank = make_bank()
    _, cp, ws, _ = build_ws(bank, async_paging=True, on_exhausted="raise")
    assert ws.poll in cp.block_hooks
    assert ws.drain in cp.pre_checkpoint_hooks
    ws.close()
    _, cp, ws, _ = build_ws(bank)  # sync + defer (defaults)
    assert ws.poll in cp.block_hooks
    assert ws.drain in cp.pre_checkpoint_hooks
    _, cp, ws, _ = build_ws(bank, on_exhausted="raise")  # sync + raise
    assert ws.poll not in cp.block_hooks
    assert ws.drain not in cp.pre_checkpoint_hooks


def test_exhaustion_defers_and_applies():
    """Default policy: a select with no eviction victim parks as a host
    intent (the voice keeps its current IR — no crash) and auto-applies
    via the block hook once a slot ages out of fade protection."""
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank, min_age_blocks=100)
    cp.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    cp.set_mapping(0, 1, CCMapping(message=0xB0, select=0x16))
    cp.set_mapping(1, 0, CCMapping(message=0xB0, select=0x17))
    cp.set_mapping(1, 1, CCMapping(message=0xB0, select=0x18))
    cp.apply_cc(0, 0, 0xB0, 0x15, 0)    # full 0
    cp.apply_cc(0, 1, 0xB0, 0x16, 15)   # full 1
    cp.apply_cc(1, 0, 0xB0, 0x17, 29)   # full 2
    cp.apply_cc(1, 1, 0xB0, 0x18, 43)   # full 3
    # a 5th distinct IR: no victim -> deferred, selection unchanged
    assert cp.apply_cc(0, 0, 0xB0, 0x15, 100)
    assert ws.starved == 1 and ws.misses == 0
    assert ws.slot_to_full[int(cp.select[0, 0])] == 0  # still full 0
    # the deferred event still restarted the fade clock (wet re-slew)
    assert cp.vsteps[0, 0] > 0
    # converge (1,1) onto full 2 so full-3's slot can age out; the intent
    # applies AUTOMATICALLY from the between-blocks poll
    cp.apply_cc(1, 1, 0xB0, 0x18, 29)
    for _ in range(500):
        cp.end_block()
        if ws.misses:
            break
    assert ws.misses == 1 and not ws._starved
    assert ws.slot_to_full[int(cp.select[0, 0])] == 100 * KFULL // 128
    # a crossfade started when it applied
    assert cp.vsteps[0, 0] > 0


def test_starved_intent_survives_checkpoint_restore():
    """A checkpoint taken while exhausted carries the parked intents in
    control.aux; restoring re-issues them (typically re-parking until a
    slot frees) instead of dropping the events."""
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank, min_age_blocks=100)
    for (v, c), f in [((0, 0), 0), ((0, 1), 1), ((1, 0), 2), ((1, 1), 3)]:
        cp.set_select(v, c, f)
    cp.set_select(0, 0, 7)                      # parks (no victim)
    assert ws.starved == 1
    st = np.asarray(cp.aux["ws_starved"])
    assert st.tolist() == [[0, 0, 7]]
    # simulate a restore into a fresh residency manager: install the
    # checkpointed aux and invoke the restore hook
    eng2, cp2, ws2, _ = build_ws(bank, min_age_blocks=100)
    for (v, c), f in [((0, 0), 0), ((0, 1), 1), ((1, 0), 2), ((1, 1), 3)]:
        cp2.set_select(v, c, f)
    cp2.aux["ws_slot_to_full"] = np.asarray(ws.slot_to_full, np.int64)
    cp2.aux["ws_starved"] = st
    ws2._restore_residency()
    # everything is protected right after restore -> the intent re-parks
    assert ws2._starved == {(0, 0): 7}
    # converge (1,1) onto full 2 so full-3's slot can age out of both the
    # selected set and its fade-span window, then the intent auto-applies
    cp2.set_select(1, 1, 2)
    for _ in range(500):
        cp2.end_block()
        if ws2.misses:
            break
    assert ws2.slot_to_full[int(cp2.select[0, 0])] == 7


def test_session_output_equals_full_bank():
    """A MIDI program that sweeps selections across the FULL bank (with
    misses and evictions) must produce bit-identical audio to a full-bank
    engine fed the equivalent (unmapped) selections."""
    bank = make_bank()
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((V, 2, B * 90)) * 0.05).astype(np.float32)
    # select full IRs 5, 8, 2 on voice 0 ch 0 over time, short fades
    events = [(10, "", bytes([0xB0, 0x15, 75])),    # full 5
              (35, "", bytes([0xB0, 0x15, 120])),   # full 8
              (65, "", bytes([0xB0, 0x15, 30]))]    # full 2

    def run_ws():
        model = ConvolutionReverb(bank, num_voices=V, block=B,
                                  max_predelay=64, engine="fmajor",
                                  bank_capacity=CAP)
        model.working_set.min_age_blocks = 20  # > speed-6 fade decay
        model.control.wet[:] = 0.8
        model.control.dry[:] = 0.1
        model.control.speed[:] = 6
        model.control.set_mapping(0, 0, CCMapping(message=0xB0,
                                                  select=0x15))
        sink = WavSink("/dev/null", keep_data=True)
        sess = model.session(WavSource(x, V, B), sink, warmup=0,
                             donate=False)
        sess.run(model.init_state(), midi=MidiSchedule(list(events)))
        return sink.data

    def run_full():
        model = ConvolutionReverb(bank, num_voices=V, block=B,
                                  max_predelay=64, engine="fmajor")
        model.control.wet[:] = 0.8
        model.control.dry[:] = 0.1
        model.control.speed[:] = 6
        model.control.set_mapping(0, 0, CCMapping(message=0xB0,
                                                  select=0x15))
        sink = WavSink("/dev/null", keep_data=True)
        sess = model.session(WavSource(x, V, B), sink, warmup=0,
                             donate=False)
        sess.run(model.init_state(), midi=MidiSchedule(list(events)))
        return sink.data

    got = run_ws()
    want = run_full()
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.abs(want).max() > 1e-3


@pytest.mark.parametrize("fault_upload", ["dual", "derived"])
def test_session_warmup_precompiles_fault_path(fault_upload):
    """model.session() wires WorkingSetBank.warmup onto pre_run_hooks: the
    run's first block must find the fault path already compiled (one
    warmup slot rewrite), and the rewrite must be a semantic no-op —
    bank contents bit-equal before/after, no miss counted. Parametrized
    over the fault payload modes: 'derived' exercises the device-side MAC
    column rebuild through the real session wiring."""
    bank = make_bank()
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((V, 2, B * 6)) * 0.05).astype(np.float32)
    model = ConvolutionReverb(bank, num_voices=V, block=B,
                              max_predelay=64, engine="fmajor",
                              bank_capacity=CAP, fault_upload=fault_upload)
    ws = model.working_set
    before = jax.tree.map(lambda a: np.asarray(a), ws.bank)
    sink = WavSink("/dev/null", keep_data=True)
    sess = model.session(WavSource(x, V, B), sink, warmup=0, donate=False)
    assert ws.warmup in sess.pre_run_hooks
    sess.run(model.init_state())
    assert ws.warmups == 1
    assert ws.misses == 0
    after = jax.tree.map(lambda a: np.asarray(a), ws.bank)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    # the published bank is the warmed one everywhere
    assert model.spectra is ws.bank


def test_warmup_failure_does_not_abort():
    """warmup is an optimization: a transient backend failure during the
    pre-compile must log and return, not propagate out of session
    start-up (the fault path then compiles lazily on the first miss)."""
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank)

    class Boom:
        def update_bank_slot(self, *a, **k):
            raise RuntimeError("backend hiccup")

    ws.engine = Boom()
    ws.warmup()                      # must not raise
    assert ws.warmups == 0


def test_fault_upload_rejected_for_non_fmajor():
    """fault_upload != 'dual' must be a loud error on engines without a
    derivable fault payload — never silently inert."""
    bank = make_bank()
    with pytest.raises(ValueError, match="fault_upload"):
        ConvolutionReverb(bank, num_voices=2, block=B, engine="cascade",
                          max_predelay=64, bank_capacity=2,
                          fault_upload="derived")


def test_cascade_slot_update_matches_rebuild():
    """cascade.update_bank_slot == rebuilding the bank with that IR in
    place (bit-level on the packed tensors)."""
    from tpu_audio.engine.cascade import CascadeConvolution

    bank = make_bank(k=4)
    long_bank = IRBank()
    rng = np.random.default_rng(7)
    for i in range(4):
        ir = rng.standard_normal((2, 900)).astype(np.float32) * 0.3
        long_bank.append(ir)
    p = long_bank.max_partitions(B)
    eng = CascadeConvolution(4, B, p, ratio=2, max_predelay=64, num_irs=3)
    sub = IRBank()
    for i in (0, 1, 2):
        sub.append(long_bank.ir(i))
    dev = eng.prepare_bank(sub)
    updated = eng.update_bank_slot(dev, 1, long_bank.ir(3))
    sub2 = IRBank()
    for i in (0, 3, 2):
        sub2.append(long_bank.ir(i))
    eng2 = CascadeConvolution(4, B, p, ratio=2, max_predelay=64, num_irs=3)
    want = eng2.prepare_bank(sub2)
    np.testing.assert_allclose(np.asarray(updated.head_rhs2),
                               np.asarray(want.head_rhs2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(updated.tail_rhs2),
                               np.asarray(want.tail_rhs2), atol=1e-6)


def test_fmajor_slot_update_matches_rebuild():
    bank = make_bank(k=4)
    p = bank.max_partitions(B)
    full = bank.partitioned_spectra(B, max_partitions=p)
    eng = FMajorPartitionedConvolution(V, B, p, max_predelay=64,
                                       num_irs=3, mac_strategy="allk")
    dev = eng.prepare_bank(full[[0, 1, 2]])
    updated = eng.update_bank_slot(dev, 0, full[3: 4])
    eng2 = FMajorPartitionedConvolution(V, B, p, max_predelay=64,
                                        num_irs=3, mac_strategy="allk")
    want = eng2.prepare_bank(full[[3, 1, 2]])
    for leaf in ("rhs2", "spectra", "spectra_rev2"):
        np.testing.assert_allclose(np.asarray(getattr(updated, leaf)),
                                   np.asarray(getattr(want, leaf)),
                                   atol=1e-6, err_msg=leaf)


def test_per_channel_banks_and_set_select_under_working_set():
    """The two coordinate spaces must not mix: set_channel_banks operates
    on full-bank windows without clobbering slot-space selections, and
    the direct set_select API remaps full indices like the CC path."""
    bank = make_bank()
    model = ConvolutionReverb(bank, num_voices=V, block=B, max_predelay=64,
                              engine="fmajor", bank_capacity=CAP)
    model.working_set.min_age_blocks = 0
    # per-channel windows (full-bank coordinates) must not rewrite the
    # slot-space select array
    model.control.set_channel_banks([(0, 4), (4, 5)])
    assert model.control.select.max() < CAP
    # direct selection of a non-resident full index pages it in
    model.control.set_select(0, 0, 7)
    slot = int(model.control.select[0, 0])
    assert slot < CAP
    assert model.working_set.slot_to_full[slot] == 7
    assert model.working_set.misses == 1
    # CC path through a channel window: value scales within the window
    model.control.set_mapping(0, 1, CCMapping(message=0xB0, select=0x15))
    assert model.control.apply_cc(0, 1, 0xB0, 0x15, 127)  # window (4,5) end
    slot1 = int(model.control.select[0, 1])
    assert model.working_set.slot_to_full[slot1] == 4 + 127 * 5 // 128


def test_fuzz_random_selects_equal_full_bank():
    """Randomized CC select streams (all voices/channels, random timing)
    through misses and evictions: still bit-identical to the full bank."""
    bank = make_bank(seed=3)
    rng = np.random.default_rng(17)
    n_blocks = 120
    x = (rng.standard_normal((V, 2, B * n_blocks)) * 0.05).astype(np.float32)
    events = []
    for _ in range(10):
        blk = int(rng.integers(1, n_blocks - 5))
        v = int(rng.integers(V))
        ch = int(rng.integers(2))
        cc = [0x15, 0x16][ch] + 2 * v
        events.append((blk, "", bytes([0xB0, cc, int(rng.integers(128))])))

    def run(capacity):
        model = ConvolutionReverb(
            bank, num_voices=V, block=B, max_predelay=64, engine="fmajor",
            **({"bank_capacity": capacity} if capacity else {}))
        if model.working_set is not None:
            model.working_set.min_age_blocks = 45  # > speed-5 fade decay
        model.control.wet[:] = 0.8
        model.control.dry[:] = 0.1
        model.control.speed[:] = 5
        for v in range(V):
            for ch in range(2):
                model.control.set_mapping(v, ch, CCMapping(
                    message=0xB0, select=[0x15, 0x16][ch] + 2 * v))
        sink = WavSink("/dev/null", keep_data=True)
        sess = model.session(WavSource(x, V, B), sink, warmup=0,
                             donate=False)
        sess.run(model.init_state(), midi=MidiSchedule(list(events)))
        return sink.data, model

    # capacity must cover pinned selections (4 channels) + slots still
    # inside the fade-protection window when a fault arrives
    got, m_ws = run(8)
    want, _ = run(None)
    assert m_ws.working_set.misses >= 1  # the stream actually faulted
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_slow_fade_reselect_chain_protects_span_slots():
    """ADVICE r2: with a SLOW fade (speed 127 -> vsteps 1016) a chain of
    re-selects leaves twice-removed IRs at audible span weight long past
    their last_used refresh. Every slot the voice's span references must
    stay protected until the analytic decay bound passes — eviction
    pressure then raises instead of rewriting columns still in the mix."""
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank, min_age_blocks=10,
                                 on_exhausted="raise")
    cp.speed[:] = 1016  # CC speed 127 (the slowest reachable fade)

    cp.set_select(0, 0, 4)           # fault; old slot 0 enters the span
    assert ws.misses == 1
    cp.blocks = 500
    cp.set_select(0, 0, 5)           # interrupt mid-fade: chain grows
    cp.blocks = 700
    cp.set_select(0, 0, 6)
    cp.blocks = 900
    # all 4 slots are now selected-or-span-referenced; a further fault
    # must refuse (the old idle-age-only rule would evict the slot whose
    # span weight is still ~0.2 here — an audible IR switch mid-tail)
    with pytest.raises(RuntimeError, match="working set exhausted"):
        cp.set_select(0, 0, 7)
    # once the last re-select's fade window (1016 + margin) has decayed,
    # the span clears analytically and eviction proceeds again
    cp.blocks = 700 + 1016 + 64
    cp.set_select(0, 0, 7)
    assert 7 in ws.full_to_slot


def build_ws_async(bank, payload_delay=0.0):
    import time as _time

    p = bank.max_partitions(B)
    eng = FMajorPartitionedConvolution(V, B, p, max_predelay=64,
                                       num_irs=CAP, mac_strategy="allk")
    full = bank.partitioned_spectra(B, max_partitions=p)
    cp = ControlPlane(V, KFULL, max_predelay=64)
    cp.wet[:] = 0.8
    cp.dry[:] = 0.1
    dev = eng.prepare_bank(full[list(range(CAP))])

    def payload(k):
        if payload_delay:
            _time.sleep(payload_delay)
        return full[k: k + 1]

    ws = WorkingSetBank(eng, cp, payload, dev, list(range(CAP)),
                        min_age_blocks=0, async_paging=True)
    return eng, cp, ws, full


def test_async_fault_never_stalls_the_caller():
    """A miss with async paging returns immediately (selection unchanged),
    the upload lands via poll() between blocks, and only then does the
    select re-issue with its crossfade."""
    import time as _time

    bank = make_bank()
    eng, cp, ws, full = build_ws_async(bank, payload_delay=1.0)
    try:
        t0 = _time.perf_counter()
        cp.set_select(0, 0, 7)                    # miss -> deferred
        assert _time.perf_counter() - t0 < 0.5, "fault stalled the caller"
        assert int(cp.select[0, 0]) == 0          # selection unchanged
        assert ws.deferred == 1 and ws.misses == 0
        # blocks keep flowing; the publish happens in a block hook
        for _ in range(2000):
            cp.end_block()                        # fires ws.poll()
            if ws.misses:
                break
            _time.sleep(0.01)
        assert ws.misses == 1
        assert int(cp.select[0, 0]) == ws.full_to_slot[7]
        assert ws.slot_to_full[int(cp.select[0, 0])] == 7
        # the re-issued select started a crossfade
        assert cp.vsteps[0, 0] > 0
    finally:
        ws.close()


def test_async_paging_output_matches_effective_time_replay():
    """Output with async paging match a FULL-bank run driven with
    the effective event times: a wet re-slew (same-select) at the original
    event block plus the real select at the block it actually applied."""
    bank = make_bank()
    full = bank.partitioned_spectra(B)
    model = ConvolutionReverb(bank, num_voices=V, block=B, engine="fmajor",
                              max_predelay=64, bank_capacity=CAP,
                              async_paging=True)
    ws = model.working_set
    base_payload = ws.slot_payload
    import time as _time
    ws.slot_payload = lambda k: (_time.sleep(0.1), base_payload(k))[1]
    model.control.wet[:] = 0.8
    model.control.dry[:] = 0.1
    model.control.speed[:] = 6
    model.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    applied = []
    orig_cb = None

    def note(voice, ch, old, new):
        applied.append((model.control.blocks, voice, ch,
                        ws.slot_to_full[int(new)]))
        orig_cb(voice, ch, old, new)

    n_blocks = 400

    class PacedSource(WavSource):
        # >= 1 ms per block: with warm jit caches 400 tiny blocks can
        # finish inside the 0.1 s pack sleep, and the deferred select
        # would never land before the source ran dry
        def read(self):
            _time.sleep(0.001)
            return super().read()

    rng = np.random.default_rng(21)
    x = (rng.standard_normal((V, 2, B * n_blocks)) * 0.05).astype(np.float32)
    source = PacedSource(x, num_voices=V, block=B)
    sink = WavSink("/dev/null", 44100, keep_data=True)
    session = model.session(source, sink)
    orig_cb = model.control.on_select_change
    model.control.on_select_change = note
    # full index 7 is not resident (cap 4) -> deferred fault at block 20
    midi = MidiSchedule([(20, "", bytes([0xB0, 0x15, 100]))])
    session.run(model.init_state(), max_blocks=n_blocks, midi=midi)
    ws.close()
    got = sink.data

    assert len(applied) == 1, f"deferred select never applied: {applied}"
    applied_block, v, ch, full_idx = applied[0]
    assert (v, ch, full_idx) == (0, 0, 7)
    assert applied_block >= 21, "select applied before the upload could land"

    # full-bank replay (block hooks fire after blocks+=1; the re-issued
    # select affects the step of the block index it was recorded at)
    model_fb = ConvolutionReverb(bank, num_voices=V, block=B,
                                 engine="fmajor", max_predelay=64)
    model_fb.control.wet[:] = 0.8
    model_fb.control.dry[:] = 0.1
    model_fb.control.speed[:] = 6
    model_fb.control.set_mapping(0, 0, CCMapping(message=0xB0, select=0x15))
    source = WavSource(x, num_voices=V, block=B)
    sink = WavSink("/dev/null", 44100, keep_data=True)
    session = model_fb.session(source, sink)
    events = [(20, "", bytes([0xB0, 0x15, 0])),   # same-select: wet re-slew
              (applied_block, "", bytes([0xB0, 0x15, 100]))]
    session.run(model_fb.init_state(), max_blocks=n_blocks,
                midi=MidiSchedule(events))
    # 1e-6: the capacity-4 and full-9 banks tile the MAC contraction
    # differently (same tolerance as the sync ws-vs-full test above)
    np.testing.assert_allclose(got, sink.data, atol=1e-6)
    assert np.abs(sink.data).max() > 1e-3


@pytest.mark.parametrize("fuzz_seed", [31, 200, 301])
def test_defer_fuzz_output_matches_effective_time_replay(fuzz_seed):
    """Randomized hot select storm against a capacity-starved working set
    under the default 'defer' exhaustion policy: the session must survive
    (no WorkingSetExhausted), and the audio must equal a FULL-bank run
    driven with the EFFECTIVE event schedule — a starved original event
    becomes a same-select (fade restart, IR unchanged) and the parked
    intent's eventual poll() application becomes a real select at the
    block it landed."""
    bank = make_bank(seed=3)
    rng = np.random.default_rng(fuzz_seed)
    n_blocks = 260
    x = (rng.standard_normal((V, 2, B * n_blocks)) * 0.05).astype(np.float32)
    events = []
    used_blocks = set()
    for _ in range(14):
        blk = int(rng.integers(1, 180))
        while blk in used_blocks:       # one event per block: keeps the
            blk += 1                    # effective-schedule replay unambiguous
        used_blocks.add(blk)
        v = int(rng.integers(V))
        ch = int(rng.integers(2))
        cc = [0x15, 0x16][ch] + 2 * v
        events.append((blk, "", bytes([0xB0, cc, int(rng.integers(128))])))
    events.sort()

    def value_for(idx):
        for val in range(128):
            if val * KFULL // 128 == idx:
                return val
        raise AssertionError(f"no CC value maps to IR {idx}")

    def setup(model):
        model.control.wet[:] = 0.8
        model.control.dry[:] = 0.1
        model.control.speed[:] = 5
        for v in range(V):
            for ch in range(2):
                model.control.set_mapping(v, ch, CCMapping(
                    message=0xB0, select=[0x15, 0x16][ch] + 2 * v))

    # --- working-set run, recording the effective schedule ------------------
    model = ConvolutionReverb(bank, num_voices=V, block=B, max_predelay=64,
                              engine="fmajor", bank_capacity=6)
    ws = model.working_set
    ws.min_age_blocks = 45              # > speed-5 fade decay
    setup(model)
    starve_log = []                     # (blocks, voice, ch, full)
    orig_starve = ws._starve

    def rec_starve(voice, ch, full_idx, now):
        starve_log.append((int(now), voice, ch, full_idx))
        return orig_starve(voice, ch, full_idx, now)

    ws._starve = rec_starve
    reissues = []                       # poll() re-issues (blocks, v, ch, full)
    orig_set = model.control.set_select

    def rec_set(voice, ch, idx):
        reissues.append((int(model.control.blocks), voice, ch, idx))
        return orig_set(voice, ch, idx)

    model.control.set_select = rec_set
    applied = []                        # every actual selection change
    sink = WavSink("/dev/null", keep_data=True)
    sess = model.session(WavSource(x, V, B), sink, warmup=0, donate=False)
    orig_cb = model.control.on_select_change

    def note(voice, ch, old, new):
        applied.append((int(model.control.blocks), voice, ch,
                        ws.slot_to_full[int(new)]))
        orig_cb(voice, ch, old, new)

    model.control.on_select_change = note
    sess.run(model.init_state(), midi=MidiSchedule(list(events)))
    got = sink.data

    assert ws.starved >= 1, "fuzz never hit exhaustion; tighten capacity"
    assert ws.misses >= 1, "fuzz never faulted; widen the select range"

    # --- effective schedule -------------------------------------------------
    # selection timeline from the recorded changes (everything starts at 0)
    def sel_at(voice, ch, blk):
        cur = 0
        for b, v, c, full in applied:
            if (v, c) == (voice, ch) and b <= blk:
                cur = full
        return cur

    starved_keys = {(b, v, c) for b, v, c, _ in starve_log}
    # a poll() re-issue recorded at block N fires from the END of block
    # N-1, i.e. BEFORE block N's MIDI events — order it first at a tie
    tagged = []
    for blk, v, ch, idx in reissues:    # poll() re-issues (incl. re-parks,
        cc = [0x15, 0x16][ch] + 2 * v   # which are same-select fade restarts)
        eff = (sel_at(v, ch, blk) if (blk, v, ch) in starved_keys else idx)
        tagged.append((blk, 0, "", bytes([0xB0, cc, value_for(eff)])))
    for blk, _, data in events:
        cc, val = data[1], data[2]
        v, ch = (cc - 0x15) // 2, (cc - 0x15) % 2
        if (blk, v, ch) in starved_keys:
            # parked: the event only restarted the fade on the CURRENT IR
            tagged.append((blk, 1, "", bytes(
                [0xB0, cc, value_for(sel_at(v, ch, blk))])))
        else:
            tagged.append((blk, 1, "", bytes([0xB0, cc, val])))
    tagged.sort(key=lambda e: (e[0], e[1]))
    replay = [(blk, dev, data) for blk, _, dev, data in tagged]

    model_fb = ConvolutionReverb(bank, num_voices=V, block=B,
                                 max_predelay=64, engine="fmajor")
    setup(model_fb)
    sink_fb = WavSink("/dev/null", keep_data=True)
    sess_fb = model_fb.session(WavSource(x, V, B), sink_fb, warmup=0,
                               donate=False)
    sess_fb.run(model_fb.init_state(), midi=MidiSchedule(replay))
    np.testing.assert_allclose(got, sink_fb.data, atol=1e-6)
    assert np.abs(sink_fb.data).max() > 1e-3


def test_deferred_select_retimes_span_protection():
    """A DEFERRED select still restarts the fade clock (the event re-slews
    wet with the new vsteps), so the span's analytic decay window must be
    re-timed exactly like the sync remap path — otherwise a slow fade
    started by the deferred event could outlive a stale window and leave
    its still-audible slots evictable by a concurrent voice's fault."""
    bank = make_bank()
    eng, cp, ws, full = build_ws_async(bank, payload_delay=0.5)
    try:
        cp.speed[:] = 900                 # slow fade (near CC max)
        # warm a sync fade first so (0, 0) has span meta to go stale
        cp.set_select(0, 0, 1)            # resident: sync path
        assert (0, 0) in ws._span_meta
        for _ in range(20):
            cp.end_block()
        now0 = cp.blocks
        cp.set_select(0, 0, 7)            # miss -> deferred
        assert ws.deferred == 1
        block, window = ws._span_meta[(0, 0)]
        assert block == now0, "deferred select must re-time the span window"
        assert window >= 900, "window must cover the NEW slow fade"
        # every span slot's idle-age protection was refreshed too
        for s in ws._span[(0, 0)]:
            assert ws.last_used[s] == now0
        ws.drain(timeout=10)
    finally:
        ws.close()


def test_restore_capacity_mismatch_raises():
    """A checkpoint whose residency table disagrees with the configured
    capacity is a configuration error, not something to guess around."""
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank)
    cp.aux["ws_slot_to_full"] = np.arange(CAP + 2, dtype=np.int64)
    with pytest.raises(ValueError, match="slots"):
        ws._restore_residency()


def test_out_of_range_select_clamps():
    """Out-of-range full indices (malformed >7-bit CC scalings) clamp to
    the bank edge like the plain engines' gathers — never page garbage."""
    bank = make_bank()
    eng, cp, ws, full = build_ws(bank)
    slot = ws._remap(0, 0, KFULL + 5)
    assert ws.slot_to_full[slot] == KFULL - 1
    slot = ws._remap(0, 0, -3)
    assert ws.slot_to_full[slot] == 0


def test_async_exhaustion_also_defers():
    """async paging + defer policy compose: when no victim slot can be
    RESERVED for the background upload, the select parks as a starved
    intent (not an async deferral) and applies once a slot frees."""
    bank = make_bank()
    eng, cp, ws, full = build_ws_async(bank)
    try:
        ws.min_age_blocks = 100
        for (v, c), f in [((0, 0), 0), ((0, 1), 1), ((1, 0), 2),
                          ((1, 1), 3)]:
            cp.set_select(v, c, f)
        ws.drain(timeout=10)
        cp.set_select(0, 0, 7)          # all 4 slots protected -> parks
        assert ws.starved == 1 and not ws._pending
        # free a slot (converge (1,1) onto full 2), age it out, and the
        # intent must re-issue through the ASYNC fault path
        cp.set_select(1, 1, 2)
        ws.drain(timeout=10)
        import time as _time
        for _ in range(2000):
            cp.end_block()
            if ws.slot_to_full[int(cp.select[0, 0])] == 7:
                break
            _time.sleep(0.002)
        assert ws.slot_to_full[int(cp.select[0, 0])] == 7
        assert not ws._starved
    finally:
        ws.close()


def test_async_upload_failure_rolls_back_residency():
    """A background payload failure must surface on the NEXT poll() and
    roll back the victim slot's residency claim — the slot still holds
    the evicted IR, and the deferred select never applies."""
    bank = make_bank()
    eng, cp, ws, full = build_ws_async(bank)
    base_payload = ws.slot_payload
    boom = {7}

    def payload(k):
        if k in boom:
            raise RuntimeError("payload exploded")
        return base_payload(k)

    ws.slot_payload = payload
    try:
        cp.set_select(0, 0, 7)          # deferred fault; upload will fail
        import time as _time
        deadline = _time.time() + 10
        while not ws._pending_order[0]["ready"].is_set():
            assert _time.time() < deadline
            _time.sleep(0.01)
        with pytest.raises(RuntimeError, match="payload exploded"):
            cp.end_block()              # poll() publishes the failure
        # rollback: slot still maps to its previous IR, nothing pending
        assert 7 not in ws.full_to_slot
        assert not ws._pending and not ws._deferred_target
        assert int(cp.select[0, 0]) == 0   # selection never moved
        # the victim slot still holds (and is findable under) the old IR
        assert sorted(ws.slot_to_full) == [0, 1, 2, 3]
        assert all(ws.full_to_slot[f] == s
                   for s, f in enumerate(ws.slot_to_full))
        # the manager still works after the failure
        boom.clear()
        cp.set_select(0, 0, 7)
        ws.drain(timeout=10)
        for _ in range(100):
            cp.end_block()
            if ws.slot_to_full[int(cp.select[0, 0])] == 7:
                break
        assert ws.slot_to_full[int(cp.select[0, 0])] == 7
    finally:
        ws.close()


def test_drain_timeout_raises():
    bank = make_bank()
    eng, cp, ws, full = build_ws_async(bank, payload_delay=5.0)
    try:
        cp.set_select(0, 0, 7)
        with pytest.raises(TimeoutError, match="did not complete"):
            ws.drain(timeout=0.05)
    finally:
        ws.close()


def test_cascade_session_output_equals_full_bank():
    """Working-set residency over the CASCADE engine (model wiring at
    models/reverb.py:198-215): a select sweep with misses/evictions is
    bit-identical to the fully-resident cascade engine."""
    bank = make_bank()
    rng = np.random.default_rng(9)
    x = (rng.standard_normal((V, 2, B * 90)) * 0.05).astype(np.float32)
    events = [(10, "", bytes([0xB0, 0x15, 75])),    # full 5
              (40, "", bytes([0xB0, 0x15, 120])),   # full 8
              (70, "", bytes([0xB0, 0x15, 30]))]    # full 2

    def run(capacity):
        model = ConvolutionReverb(
            bank, num_voices=V, block=B, max_predelay=64, engine="cascade",
            **({"bank_capacity": capacity} if capacity else {}))
        if model.working_set is not None:
            model.working_set.min_age_blocks = 20
        model.control.wet[:] = 0.8
        model.control.dry[:] = 0.1
        model.control.speed[:] = 6
        model.control.set_mapping(0, 0, CCMapping(message=0xB0,
                                                  select=0x15))
        sink = WavSink("/dev/null", keep_data=True)
        sess = model.session(WavSource(x, V, B), sink, warmup=0,
                             donate=False)
        sess.run(model.init_state(), midi=MidiSchedule(list(events)))
        return sink.data, model

    got, m_ws = run(CAP)
    assert m_ws.working_set.misses >= 1
    want, _ = run(None)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.abs(want).max() > 1e-3


@pytest.mark.parametrize("fuzz_seed", [5, 42])
def test_fuzz_all_cc_types_equal_full_bank(fuzz_seed):
    """Randomized streams over EVERY mapped controller — select,
    predelay, dry, wet, speed, panDry, panWet, level — through misses
    and evictions: the working set stays bit-identical to the full bank
    (remap touches only selects; the other CCs must be transparent to
    residency, including predelay edits racing fades and slot uploads)."""
    bank = make_bank(seed=7)
    rng = np.random.default_rng(fuzz_seed)
    n_blocks = 140
    x = (rng.standard_normal((V, 2, B * n_blocks)) * 0.05).astype(np.float32)
    # controller layout per (v, ch): base + 0..7 for the 8 functions
    base = {(v, ch): 0x10 + 16 * (2 * v + ch)
            for v in range(V) for ch in range(2)}
    events = []
    for _ in range(28):
        blk = int(rng.integers(1, n_blocks - 10))
        v, ch = int(rng.integers(V)), int(rng.integers(2))
        fn = int(rng.integers(8))
        events.append((blk, "", bytes([0xB0, base[(v, ch)] + fn,
                                       int(rng.integers(128))])))
    events.sort()

    def run(capacity):
        model = ConvolutionReverb(
            bank, num_voices=V, block=B, max_predelay=64, engine="fmajor",
            **({"bank_capacity": capacity,
                # starvation would legitimately diverge from the full
                # bank (deferred application); this fuzz sizes capacity
                # to avoid it and 'raise' makes a violation loud
                "ws_exhausted": "raise"} if capacity else {}))
        if model.working_set is not None:
            model.working_set.min_age_blocks = 45
        model.control.wet[:] = 0.8
        model.control.dry[:] = 0.1
        model.control.speed[:] = 5
        for v in range(V):
            for ch in range(2):
                c = base[(v, ch)]
                model.control.set_mapping(v, ch, CCMapping(
                    message=0xB0, select=c, predelay=c + 1, dry=c + 2,
                    wet=c + 3, speed=c + 4, pan_dry=c + 5, pan_wet=c + 6,
                    level=c + 7))
        sink = WavSink("/dev/null", keep_data=True)
        sess = model.session(WavSource(x, V, B), sink, warmup=0,
                             donate=False)
        sess.run(model.init_state(), midi=MidiSchedule(list(events)))
        return sink.data, model

    got, m_ws = run(8)
    want, _ = run(None)
    assert m_ws.working_set.misses >= 1, "fuzz never faulted"
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.abs(want).max() > 1e-3
