"""Production TPU engine: f-major planar partitioned overlap-save.

Numerically identical to PartitionedConvolution(variant="coef") —
equivalence-tested in tests/test_fmajor.py — but with layouts chosen from
on-chip measurements (the naive complex-array engine spends 15.8 ms/block at
the 64-voice/4s-IR flagship point; this one ~3.5 ms, Pallas kernel next):

  - the frequency-domain delay line is stored f-MAJOR and planar-f32:
    ``fdl [F, V*I, P*2]`` (re/im interleaved along the partition axis), so
    the partition MAC is a single batched-per-frequency-bin real matmul
      [V*I, P*2] x [P*2, K*O*2]   for each of the F bins,
    with the partition axis on the 128-lane dimension (F=257 no longer
    causes lane padding; P*2 pads ~2%);
  - the IR bank enters the MAC as a host-precomputed REAL tensor
    ``mac_rhs [F, P*2, K*O*2]`` encoding each bank spectrum's complex
    multiplication as a 2x2 real matrix — complex64 never crosses the host
    boundary (some TPU transports cannot transfer it, utils/transfer.py),
    and the per-voice bank gather disappears: the MAC computes ALL K bank
    entries' contributions (cheap on the MXU for typical live-bank sizes)
    and a [V,2]-indexed take picks each voice's selection afterwards.
    For large banks (K > ~16) this trades FLOPs badly — use the
    PartitionedConvolution gather engine there, or per-voice materialized
    spectra (see docstring of step_coef);
  - crossfades use the same affine-coefficient representation as
    PartitionedConvolution.step_coef (scalar slew recursion, host collapse
    on re-select, steady-state step that skips the base term).

The IR time-reversal trick used by the ring-pointer variants is NOT used
here: the fdl is shifted one partition per block (a [F, VI, P2] roll), which
keeps the per-voice ``base`` fade spectra naturally aligned. The planned
Pallas kernel replaces the roll with in-kernel ring indexing.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

import jax
import jax.numpy as jnp

from tpu_audio.engine.params import VoiceParams
from tpu_audio.ops.fft import SpectralTransform
from tpu_audio.ops.mix import pan_gains


@jax.tree_util.register_dataclass
@dataclass
class FMajorBank:
    """Device-side bank in MAC-ready real layouts (host-precomputed)."""

    mac_rhs: jax.Array   # f32 [F, P*2, K*O*2]: complex-mult 2x2 blocks
    spectra: jax.Array   # f32 [K, O, P, F, 2]: planar spectra (collapse/init)

    @property
    def num_irs(self) -> int:
        return self.spectra.shape[0]


@jax.tree_util.register_dataclass
@dataclass
class FMajorState:
    fdl: jax.Array       # f32 [F, V*I, P*2] planar freq-domain delay line
    prev_in: jax.Array   # f32 [V, 2, B]
    wet_ring: jax.Array  # f32 [V, 2, maxPD + B]
    base: jax.Array      # f32 [F, V, I, O, P, 2] frozen fade snapshot
    coef_a: jax.Array    # f32 [V, 2]
    coef_c: jax.Array    # f32 [V, 2]


def pack_mac_rhs(spectra: np.ndarray) -> np.ndarray:
    """[K, O, P, F] complex -> [F, P*2, K*O*2] f32 MAC rhs.

    Column pairs (d) are (re, im) of each (k, o); row pairs (c) are the
    (re, im) of the fdl, so  y_d = sum_{p,c} fdl[p,c] * rhs[p,c,d]
    implements the complex product-sum  sum_p X_p * H_p.
    """
    k, o, p, f = spectra.shape
    br = spectra.real.astype(np.float32)
    bi = spectra.imag.astype(np.float32)
    # rhs[c=0 (ar)] -> (br, bi); rhs[c=1 (ai)] -> (-bi, br)
    rhs = np.empty((f, p, 2, k, o, 2), np.float32)
    rhs[:, :, 0, :, :, 0] = np.transpose(br, (3, 2, 0, 1))
    rhs[:, :, 0, :, :, 1] = np.transpose(bi, (3, 2, 0, 1))
    rhs[:, :, 1, :, :, 0] = -np.transpose(bi, (3, 2, 0, 1))
    rhs[:, :, 1, :, :, 1] = np.transpose(br, (3, 2, 0, 1))
    return rhs.reshape(f, p * 2, k * o * 2)


def pack_planar_spectra(spectra: np.ndarray) -> np.ndarray:
    """[K, O, P, F] complex -> [K, O, P, F, 2] f32."""
    return np.stack([spectra.real, spectra.imag], axis=-1).astype(np.float32)


class FMajorPartitionedConvolution:
    """V stereo voices, f-major planar partitioned-OLS, coef crossfades."""

    variant = "coef"  # runtime-compatible with the coef engine interface

    def __init__(self, num_voices: int, block: int, partitions: int,
                 max_predelay: int = 8192, backend: str = "auto"):
        self.num_voices = num_voices
        self.block = block
        self.partitions = partitions
        self.max_predelay = max_predelay
        self.xf = SpectralTransform(2 * block, backend=backend)
        self.num_bins = self.xf.num_bins
        self.ring = max_predelay + block

    # -- bank ---------------------------------------------------------------------

    def prepare_bank(self, spectra: np.ndarray) -> FMajorBank:
        """Host [K, 2, P, F] complex spectra -> device FMajorBank (f32-only
        transfers)."""
        spectra = np.asarray(spectra)
        if spectra.shape[2] != self.partitions or spectra.shape[3] != self.num_bins:
            raise ValueError(f"bank geometry {spectra.shape} != engine "
                             f"(P={self.partitions}, F={self.num_bins})")
        return FMajorBank(
            mac_rhs=jnp.asarray(pack_mac_rhs(spectra)),
            spectra=jnp.asarray(pack_planar_spectra(spectra)),
        )

    # -- state ---------------------------------------------------------------------

    def init_state(self) -> FMajorState:
        v, b, p, f = self.num_voices, self.block, self.partitions, self.num_bins
        return jax.jit(lambda: FMajorState(
            fdl=jnp.zeros((f, v * 2, p * 2), jnp.float32),
            prev_in=jnp.zeros((v, 2, b), jnp.float32),
            wet_ring=jnp.zeros((v, 2, self.ring), jnp.float32),
            base=jnp.zeros((f, v, 2, 2, p, 2), jnp.float32),
            coef_a=jnp.zeros((v, 2), jnp.float32),
            coef_c=jnp.zeros((v, 2), jnp.float32),
        ))()

    def init_converged(self, bank: FMajorBank, params: VoiceParams) -> FMajorState:
        state = self.init_state()
        return replace(state,
                       coef_c=jax.jit(lambda w: w.astype(jnp.float32) + 0.0)(
                           params.wet))

    # -- hot step -------------------------------------------------------------------

    def _push(self, state: FMajorState, x: jax.Array) -> jax.Array:
        """OLS segment rfft -> planar f-major -> shift delay line."""
        seg = jnp.concatenate([state.prev_in, x], axis=-1)       # [V, 2, 2B]
        spec = self.xf.rfft(seg)                                  # [V, 2, F] c64
        v = self.num_voices
        xn = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)  # [V,2,F,2]
        xn = jnp.transpose(xn, (2, 0, 1, 3)).reshape(
            self.num_bins, v * 2, 2)                               # [F, VI, 2]
        # shift partitions by one (slots [2:] <- [:-2]), new X into slot 0
        fdl = jnp.concatenate([xn, state.fdl[:, :, :-2]], axis=-1)
        return fdl

    def _wet_scale(self, params: VoiceParams) -> jax.Array:
        gl, gr = pan_gains(params.pan_wet)
        return jnp.stack([gl, gr], axis=-1) * params.level[..., None]  # [V,2,O]

    def _finish(self, state, params, x, y, **updates):
        """y [F, V, O, 2] planar spectra -> irfft -> predelay ring -> mix."""
        b, v, f = self.block, self.num_voices, self.num_bins
        spec = jax.lax.complex(y[..., 0], y[..., 1])              # [F, V, O]
        spec = jnp.transpose(spec, (1, 2, 0))                     # [V, O, F]
        wet = self.xf.irfft(spec)[..., b:]                        # [V, O, B]

        ring = jnp.concatenate(
            [state.wet_ring[..., b:],
             jnp.zeros(state.wet_ring.shape[:-1] + (b,), jnp.float32)], axis=-1)
        pd = params.predelay[:, 0]

        def _add_at(r, w_blk, s):
            cur = jax.lax.dynamic_slice_in_dim(r, s, b, axis=-1)
            return jax.lax.dynamic_update_slice_in_dim(r, cur + w_blk, s, axis=-1)

        ring = jax.vmap(_add_at)(ring, wet, pd)
        out = jnp.clip(ring[..., :b], -1.0, 1.0)
        dgl, dgr = pan_gains(params.pan_dry)
        dry_gain = (jnp.stack([dgl, dgr], axis=-1)
                    * (params.dry * params.level)[..., None])
        out = out + jnp.einsum("vib,vio->vob", x, dry_gain)
        return replace(state, prev_in=x, wet_ring=ring, **updates), out

    def step_coef(self, state: FMajorState, bank: FMajorBank,
                  params: VoiceParams, x: jax.Array, with_base: bool = True):
        """Full step (fade-capable). See PartitionedConvolution.step_coef for
        the semantics contract; this is the same math in f-major layout."""
        v, f, p = self.num_voices, self.num_bins, self.partitions
        k = bank.num_irs
        fdl = self._push(state, x)

        r = 1.0 / (params.vsteps.astype(jnp.float32) + 5.0)
        a = state.coef_a * (1.0 - r)
        c = state.coef_c * (1.0 - r) + params.wet * r
        scale = self._wet_scale(params)                           # [V, I, O]

        # all-K MAC: [F, VI, P2] x [F, P2, KO2] -> [F, VI, KO2]
        m = jnp.einsum("fvp,fpk->fvk", fdl, bank.mac_rhs,
                       precision=jax.lax.Precision.HIGHEST)
        m = m.reshape(f, v, 2, k, 2, 2)                           # [F,V,I,K,O,d]
        sel = params.select[None, :, :, None, None, None]
        y_sel = jnp.take_along_axis(m, sel, axis=3)[:, :, :, 0]   # [F,V,I,O,d]

        coef = (c[..., None] * scale)                             # [V, I, O]
        y = jnp.einsum("fviod,vio->fvod", y_sel, coef)

        if with_base:
            # base MAC (fades only): complex product-sum over p per (v,i,o)
            fb = fdl.reshape(f, v, 2, p, 2)
            ar, ai = fb[..., 0], fb[..., 1]
            br, bi = state.base[..., 0], state.base[..., 1]
            yre = (jnp.einsum("fvip,fviop->fvio", ar, br)
                   - jnp.einsum("fvip,fviop->fvio", ai, bi))
            yim = (jnp.einsum("fvip,fviop->fvio", ar, bi)
                   + jnp.einsum("fvip,fviop->fvio", ai, br))
            coef_b = (a[..., None] * scale)
            y = y + jnp.einsum(
                "fviod,vio->fvod", jnp.stack([yre, yim], axis=-1), coef_b)

        return self._finish(state, params, x, y,
                            fdl=fdl, coef_a=a, coef_c=c)

    def step_coef_steady(self, state, bank, params, x):
        """Steady-state hot path: base term elided (coef_a ~ 0)."""
        return self.step_coef(state, bank, params, x, with_base=False)

    def step(self, state, bank, params, x):
        return self.step_coef(state, bank, params, x)

    # -- rare path ---------------------------------------------------------------------

    def collapse(self, state: FMajorState, bank: FMajorBank,
                 old_select: jax.Array, changed: jax.Array) -> FMajorState:
        """Re-base the affine form after IR re-select (host-triggered)."""
        gathered = jnp.take(bank.spectra, old_select, axis=0)  # [V,I,O,P,F,2]
        gathered = jnp.transpose(gathered, (4, 0, 1, 2, 3, 5))  # [F,V,I,O,P,2]
        collapsed = (state.coef_a[None, :, :, None, None, None] * state.base
                     + state.coef_c[None, :, :, None, None, None] * gathered)
        mask = changed[None, :, :, None, None, None]
        return replace(
            state,
            base=jnp.where(mask, collapsed, state.base),
            coef_a=jnp.where(changed, 1.0, state.coef_a),
            coef_c=jnp.where(changed, 0.0, state.coef_c),
        )
