import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.engine import ControlPlane, IRBank, PartitionedConvolution
from tpu_audio.parallel.mesh import (
    make_mesh, partitioned_shardings, place_bank, place_state,
    shard_collapse, shard_partitioned_step,
)

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def build(num_voices=8, block=32, ir_len=256, num_irs=2, variant="coef"):
    rng = np.random.default_rng(0)
    bank = IRBank()
    for _ in range(num_irs):
        ir = rng.standard_normal((2, ir_len)).astype(np.float32)
        bank.append(ir * (0.4 / np.abs(ir).max()))
    eng = PartitionedConvolution(num_voices, block, bank.max_partitions(block),
                                 max_predelay=64, variant=variant)
    spectra = jnp.asarray(bank.partitioned_spectra(block))
    cp = ControlPlane(num_voices, num_irs, max_predelay=64)
    cp.wet[:] = 0.8
    cp.dry[:] = 0.1
    return eng, spectra, cp, bank


@requires_8
@pytest.mark.parametrize("voice,part", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_single_device(voice, part):
    """The mesh-sharded step must produce the same audio as the unsharded
    step for every (voice x part) factoring, including IR-partition
    sharding (psum + boundary shift inserted by XLA)."""
    eng, spectra, cp, _ = build(num_voices=8, block=32)
    mesh = make_mesh(voice * part, part=part)
    step_sharded = shard_partitioned_step(eng, mesh, donate=False)
    step_plain = jax.jit(eng.step_coef, donate_argnums=())

    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state_s = place_state(eng.init_converged(spectra, params), mesh, eng)
    bank_s = place_bank(spectra, mesh)
    state_p = eng.init_converged(spectra, params)

    rng = np.random.default_rng(1)
    for t in range(6):
        x = jnp.asarray(rng.standard_normal((8, 2, 32)).astype(np.float32) * 0.05)
        state_s, out_s = step_sharded(state_s, bank_s, params, x)
        state_p, out_p = step_plain(state_p, spectra, params, x)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                                   atol=1e-5, err_msg=f"block {t}")


@requires_8
def test_sharded_collapse_and_crossfade():
    eng, spectra, cp, _ = build(num_voices=8, block=32)
    mesh = make_mesh(8, part=2)
    step = shard_partitioned_step(eng, mesh, donate=False)
    collapse = shard_collapse(eng, mesh, donate=False)

    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = place_state(eng.init_converged(spectra, params), mesh, eng)
    bank_s = place_bank(spectra, mesh)

    old = cp.select.copy()
    cp.select[:] = 1
    cp.vsteps[:] = 4
    state = collapse(state, bank_s, jnp.asarray(old),
                     jnp.asarray(np.ones_like(old, bool)))
    rng = np.random.default_rng(2)
    out = None
    for t in range(10):
        params = jax.tree.map(jnp.asarray, cp.snapshot())
        x = jnp.asarray(rng.standard_normal((8, 2, 32)).astype(np.float32) * 0.05)
        state, out = step(state, bank_s, params, x)
        cp.end_block()
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() > 1e-4


@requires_8
def test_sharded_steady_step():
    eng, spectra, cp, _ = build(num_voices=8, block=32)
    mesh = make_mesh(8, part=2)
    steady = shard_partitioned_step(eng, mesh, steady=True, donate=False)
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = place_state(eng.init_converged(spectra, params), mesh, eng)
    bank_s = place_bank(spectra, mesh)
    x = jnp.zeros((8, 2, 32), jnp.float32)
    state, out = steady(state, bank_s, params, x)
    assert out.shape == (8, 2, 32)


def test_mesh_validation():
    eng, spectra, cp, _ = build(num_voices=3, block=32)
    mesh = make_mesh(min(2, len(jax.devices())))
    if mesh.shape["voice"] > 1:
        with pytest.raises(ValueError):
            shard_partitioned_step(eng, mesh)


def test_single_device_mesh_degenerate():
    """1-device mesh must work and equal the plain step (the laptop case)."""
    eng, spectra, cp, _ = build(num_voices=2, block=32)
    mesh = make_mesh(1)
    step = shard_partitioned_step(eng, mesh, donate=False)
    params = jax.tree.map(jnp.asarray, cp.snapshot())
    state = place_state(eng.init_converged(spectra, params), mesh, eng)
    x = jnp.zeros((2, 2, 32), jnp.float32).at[:, :, 0].set(1.0)
    state, out = step(state, place_bank(spectra, mesh), params, x)
    state_p, out_p = jax.jit(eng.step_coef)(
        eng.init_converged(spectra, params), spectra, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), atol=1e-6)
