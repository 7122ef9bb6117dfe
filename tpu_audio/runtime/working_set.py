"""Working-set IR residency: serve a large bank at small-bank speed.

The all-K MAC's per-block cost scales with the number of RESIDENT IRs
(its rhs window is read every block), which is why the reference's own
152-IR `all.index` pushed the f-major engine onto the slower 'selected'
strategy (README: 3.7 ms steady vs 0.77 at K<=16). But voices rarely USE
more than a handful of IRs at once — selections draw from a menu. This
module keeps only a small working set resident on the device (like a KV
cache): the engine runs the fast all-K path over ``capacity`` slots, the
control plane's select events are remapped full-index -> slot, and a
bank miss packs + uploads ONE IR's columns between blocks
(`engine.update_bank_slot`, a few MB — invisible on PCIe, ~0.1 s on a
tunneled dev chip).

Eviction safety: a slot's contents participate in audio as long as any
voice selects it OR an in-flight crossfade's span (`base_g`) references
it. Slots are only reclaimed when (a) no voice currently selects them
and (b) they have not been touched for ``min_age_blocks`` PROCESSED
blocks — longer than any crossfade — so replaced slots are provably
inert. The clock is the control plane's block counter, NOT wall time:
sessions run slower than real time on high-RTT links and faster offline,
and fades decay in block time either way. Slots never selected since
startup are reclaimable immediately. If every slot is protected, the
miss raises: capacity must exceed the number of concurrently sounding
IRs (plus those still fading out), a configuration error.

The reference has no analogue (its GPU holds the whole bank; at TPU
voice counts and IR lengths that is the thing that stops scaling).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from tpu_audio.utils.log import Log


class WorkingSetBank:
    """Host-side residency manager for one engine's device bank.

    Parameters
    ----------
    engine: an engine exposing ``update_bank_slot(bank, slot, payload)``
        (fmajor 'allk' or cascade), built with ``num_irs == capacity``.
    control: the ControlPlane whose ``select_remap`` hook this installs.
        ``control.select`` then holds SLOT indices; CC scaling and
        per-channel bank windows keep operating on full-bank indices.
    slot_payload: full-bank index -> the engine's upload payload
        (fmajor: [1, O, P, F] complex spectra; cascade: [O, L] samples).
    bank: the initial device bank (slots 0..capacity-1 = ``residents``).
    residents: full-bank indices initially resident, in slot order.
    min_age_blocks: minimum idle PROCESSED-block count before an
        ever-used slot may be reclaimed; must exceed the longest
        crossfade (CC-reachable maximum: speed 127 -> 1016 blocks).
    """

    def __init__(self, engine, control, slot_payload: Callable[[int], object],
                 bank, residents: list[int], min_age_blocks: int = 1100,
                 full_size: int | None = None):
        self.engine = engine
        self.control = control
        self.slot_payload = slot_payload
        self.bank = bank
        self.capacity = len(residents)
        self.full_size = (full_size if full_size is not None else
                          int(np.max(control.select_base
                                     + control.select_span)))
        self.min_age_blocks = min_age_blocks
        self.slot_to_full = list(residents)
        self.full_to_slot = {f: s for s, f in enumerate(residents)}
        self.last_used = [float("-inf")] * self.capacity  # never selected
        self.misses = 0
        self.hits = 0
        self.on_update: Callable[[object], None] | None = None
        control.select_remap = self._remap

    # -- the remap hook (runs on the host between blocks) -----------------------

    def _remap(self, voice: int, ch: int, full_idx: int) -> int:
        if not 0 <= full_idx < self.full_size:
            # out-of-range CC scalings (the reference formula can exceed
            # the bank for malformed >7-bit values) clamp like the plain
            # engines' gathers do — never page in garbage
            Log.warn("workset", "select %d outside the %d-IR bank; clamped",
                     full_idx, self.full_size)
            full_idx = min(max(full_idx, 0), self.full_size - 1)
        now = self.control.blocks
        # the outgoing slot enters its fade-out: refresh its protection
        self.last_used[int(self.control.select[voice, ch])] = now
        slot = self.full_to_slot.get(full_idx)
        if slot is None:
            slot = self._fault(full_idx, now)
        else:
            self.hits += 1
        self.last_used[slot] = now
        return slot

    def _fault(self, full_idx: int, now: float) -> int:
        selected = {int(s) for s in self.control.select.ravel()}
        victims = [s for s in range(self.capacity)
                   if s not in selected
                   and now - self.last_used[s] >= self.min_age_blocks]
        if not victims:
            raise RuntimeError(
                f"working set exhausted: all {self.capacity} resident IR "
                f"slots are selected or were used within the last "
                f"{self.min_age_blocks} blocks (fade protection); raise "
                f"the capacity (concurrently sounding IRs + fading tails "
                f"must fit)")
        victim = min(victims, key=lambda s: self.last_used[s])
        old_full = self.slot_to_full[victim]
        self.full_to_slot.pop(old_full, None)
        self.slot_to_full[victim] = full_idx
        self.full_to_slot[full_idx] = victim
        self.bank = self.engine.update_bank_slot(
            self.bank, victim, self.slot_payload(full_idx))
        self.misses += 1
        Log.info("workset", "IR %d -> slot %d (evicted %d; miss #%d)",
                 full_idx, victim, old_full, self.misses)
        if self.on_update is not None:
            self.on_update(self.bank)
        return victim
