"""Guards around jax-0.9 layout plumbing (utils/layouts.py).

Two empirically-confirmed backend bugs motivate these (see the module
docstring of tpu_audio/utils/layouts.py; both reproduced on the TPU
backend 2026-08-18):

  1. the persistent compilation cache key omits in_/out_shardings layout
     constraints, so a pinned compile can silently load an entry compiled
     under different layouts;
  2. jax.device_put(arr, format) can silently keep the old layout.

The repair paths themselves need a TPU to trigger; what CPU tests can
pin down is the host-side logic: AUTO/None exemption, leafwise format
comparison, the no-op fast path of place_in_formats, the cache-disable
context, and the verify-then-recompile control flow (via monkeypatch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.utils import layouts


def _cpu_format(arr):
    return arr.format


@pytest.fixture
def no_cache_dir():
    """Force the no-persistent-cache scenario (compile_pinned's
    cache-bypassed fallback) regardless of what earlier tests configured."""
    saved = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", saved)


def test_is_concrete_none_and_auto():
    from jax.experimental.layout import Format, Layout

    assert not layouts._is_concrete(None)
    assert not layouts._is_concrete(Format(Layout.AUTO))
    a = jnp.zeros((4, 8))
    assert layouts._is_concrete(a.format)


def test_formats_agree_skips_auto_and_none():
    from jax.experimental.layout import Format, Layout

    a = jnp.zeros((4, 8))
    b = jnp.zeros((2, 2, 128))
    got = (a.format, b.format)
    assert layouts.formats_agree((a.format, b.format), got)
    # AUTO and None placeholders match anything
    assert layouts.formats_agree((Format(Layout.AUTO), None), got)
    # a concrete mismatch is caught (different shapes -> different str)
    assert not layouts.formats_agree((b.format, a.format), got)
    # leaf-count mismatch is a disagreement, not an error
    assert not layouts.formats_agree((a.format,), got)


def test_place_in_formats_noop_fast_path():
    """Leaves already in the right format pass through IDENTICALLY (no
    transfer, no copy) — the hot path when nothing is poisoned."""
    tree = {"x": jnp.arange(8.0), "y": jnp.ones((2, 3))}
    fmt = jax.tree.map(_cpu_format, tree)
    out = layouts.place_in_formats(tree, fmt, "t")
    assert out["x"] is tree["x"] and out["y"] is tree["y"]


def test_place_in_formats_none_and_count_check():
    tree = {"x": jnp.arange(8.0)}
    out = layouts.place_in_formats(tree, {"x": None}, "t")
    assert out["x"] is tree["x"]
    with pytest.raises(ValueError, match="leaves"):
        layouts.place_in_formats({"x": jnp.zeros(3), "y": jnp.zeros(3)},
                                 {"x": None}, "t")


def test_compilation_cache_disabled_restores():
    before = jax.config.jax_enable_compilation_cache
    with layouts.compilation_cache_disabled():
        assert jax.config.jax_enable_compilation_cache is False
    assert jax.config.jax_enable_compilation_cache == before
    # and restores even when the body raises
    with pytest.raises(RuntimeError):
        with layouts.compilation_cache_disabled():
            raise RuntimeError("boom")
    assert jax.config.jax_enable_compilation_cache == before


def test_compilation_cache_disabled_overrides_memoized_decision():
    """jax 0.9's compilation_cache.is_cache_used() memoizes its verdict in
    module globals on the first compile of the process — toggling the
    config flag afterwards is a NO-OP for cache reads (the leak behind
    every phantom-layout bench failure of 2026-08-18). The context must
    force the memoized pair to (checked, unused) and restore it."""
    from jax._src import compilation_cache as cc

    with cc._cache_initialized_mutex:
        saved = (cc._cache_checked, cc._cache_used)
        # simulate a process whose first compile ran with the cache on
        cc._cache_checked, cc._cache_used = True, True
    try:
        with layouts.compilation_cache_disabled():
            assert cc._cache_checked is True
            assert cc._cache_used is False
            assert not cc.is_cache_used(object())  # memoized short-circuit
        assert (cc._cache_checked, cc._cache_used) == (True, True)
        # restored on raise too
        with pytest.raises(RuntimeError):
            with layouts.compilation_cache_disabled():
                raise RuntimeError("boom")
        assert (cc._cache_checked, cc._cache_used) == (True, True)
    finally:
        with cc._cache_initialized_mutex:
            cc._cache_checked, cc._cache_used = saved


def test_compilation_cache_disabled_is_reentrant():
    """Overlapping uses (async-paging worker + session thread) must keep
    the cache disabled until the OUTERMOST user exits — a first-exit
    restore would re-enable the persistent cache mid-pinned-compile."""
    from jax._src import compilation_cache as cc

    with cc._cache_initialized_mutex:
        saved = (cc._cache_checked, cc._cache_used)
        cc._cache_checked, cc._cache_used = True, True
    try:
        with layouts.compilation_cache_disabled():
            with layouts.compilation_cache_disabled():
                assert cc._cache_used is False
                assert jax.config.jax_enable_compilation_cache is False
            # inner exit: still disabled (outer user still active)
            assert cc._cache_used is False
            assert jax.config.jax_enable_compilation_cache is False
        assert (cc._cache_checked, cc._cache_used) == (True, True)
        assert jax.config.jax_enable_compilation_cache
    finally:
        with cc._cache_initialized_mutex:
            cc._cache_checked, cc._cache_used = saved


def test_layout_scoped_cache_no_dir_falls_back_disabled():
    """Without a configured cache dir there is nothing to scope: the
    context degrades to the cache-bypassed window."""
    saved = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        with layouts.layout_scoped_cache("k") as scoped:
            assert scoped is False
            assert jax.config.jax_enable_compilation_cache is False
        assert jax.config.jax_enable_compilation_cache
    finally:
        jax.config.update("jax_compilation_cache_dir", saved)


def test_layout_scoped_cache_routes_to_keyed_dir(tmp_path):
    """With a base dir, the context re-routes the persistent cache to a
    constraint-keyed subdirectory, enabled, and restores everything —
    including across an interleaved disable window and on raise."""
    import os

    saved = jax.config.jax_compilation_cache_dir
    base = str(tmp_path / "cc")
    jax.config.update("jax_compilation_cache_dir", base)
    try:
        with layouts.layout_scoped_cache("constraints-A") as scoped:
            assert scoped is True
            sub = jax.config.jax_compilation_cache_dir
            assert sub.startswith(os.path.join(base, "layout_scoped"))
            assert os.path.isdir(sub)
            assert jax.config.jax_enable_compilation_cache is True
            # a disable window opening inside restores the scoped state
            with layouts.compilation_cache_disabled():
                assert jax.config.jax_enable_compilation_cache is False
            assert jax.config.jax_enable_compilation_cache is True
            assert jax.config.jax_compilation_cache_dir == sub
            # same key -> same dir; different key -> different dir
            with layouts.layout_scoped_cache("constraints-A") as nested:
                # another cache-state context is active: fall back
                assert nested is False
        assert jax.config.jax_compilation_cache_dir == base
        with pytest.raises(RuntimeError):
            with layouts.layout_scoped_cache("constraints-B"):
                raise RuntimeError("boom")
        assert jax.config.jax_compilation_cache_dir == base
        # a disable window already active -> scoped falls back
        with layouts.compilation_cache_disabled():
            with layouts.layout_scoped_cache("constraints-C") as scoped:
                assert scoped is False
    finally:
        jax.config.update("jax_compilation_cache_dir", saved)


def test_layout_scoped_cache_distinct_keys_distinct_dirs(tmp_path):
    saved = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        dirs = []
        for key in ("A", "B", "A"):
            with layouts.layout_scoped_cache(key) as scoped:
                assert scoped
                dirs.append(jax.config.jax_compilation_cache_dir)
        assert dirs[0] == dirs[2] != dirs[1]
    finally:
        jax.config.update("jax_compilation_cache_dir", saved)


def test_compile_pinned_always_bypasses_even_with_dir(tmp_path,
                                                      monkeypatch):
    """Layout-scoped caching of compile_pinned was tried and REVERTED:
    a cache-loaded layout-constrained executable computes correct values
    but poisons the layout-pinning flow built on its metadata (on-chip
    bisect 2026-08-19). compile_pinned must bypass the cache even when a
    dir is configured; pinned_init (no inputs + buffer-truth verified)
    keeps the scoped cache."""
    from jax.experimental.layout import Format, Layout

    saved = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        x = jnp.ones((4, 8))
        seen = []
        real_lower = jax.stages.Traced.lower

        def spy(self, *a, **k):
            seen.append((jax.config.jax_enable_compilation_cache,
                         jax.config.jax_compilation_cache_dir))
            return real_lower(self, *a, **k)

        monkeypatch.setattr(jax.stages.Traced, "lower", spy)
        auto = Format(Layout.AUTO)
        fn = layouts.compile_pinned(lambda a: a * 2, (x,), (auto,), auto)
        np.testing.assert_allclose(np.asarray(fn(x)), 2.0)
        fmt = x.format
        fn2 = layouts.compile_pinned(lambda a: a * 3, (x,), (fmt,), fmt)
        np.testing.assert_allclose(np.asarray(fn2(x)), 3.0)
        assert [e for e, _ in seen] == [False, False]
        # pinned_init bypasses too (a scoped-cache-loaded init emitted
        # off-format leaves whose repair itself failed, bench 2026-08-19)
        st = layouts.pinned_init(lambda: jnp.ones((3, 5)),
                                 jnp.zeros((3, 5)).format)
        np.testing.assert_allclose(np.asarray(st), 1.0)
    finally:
        jax.config.update("jax_compilation_cache_dir", saved)


def test_place_in_formats_places_under_disabled_cache(monkeypatch):
    """Format placement lowers a relayout program whose persistent-cache
    key omits the target layout (workaround #4) — the device_put rungs
    must run inside compilation_cache_disabled()."""
    import numpy as _np

    # a HOST leaf (no .format attribute) forces the placement path even
    # though the target format is the CPU default
    tree = {"x": _np.arange(8.0, dtype=_np.float32)}
    fmt = {"x": jnp.arange(8.0).format}
    seen = []
    orig_put = jax.device_put

    def spy_put(a, f=None, **kw):
        seen.append(jax.config.jax_enable_compilation_cache)
        return orig_put(a, f, **kw)

    monkeypatch.setattr(layouts.jax, "device_put", spy_put)
    out = layouts.place_in_formats(tree, fmt, "t")
    # CPU formats match after the first device_put, so exactly one
    # placement happened — and it ran with the cache disabled
    assert seen and all(s is False for s in seen)
    _np.testing.assert_allclose(_np.asarray(out["x"]),
                                _np.asarray(tree["x"]))
    assert jax.config.jax_enable_compilation_cache  # restored


def test_compile_pinned_honored_on_cpu():
    """CPU formats are all default row-major, so a pinned compile is
    trivially honored — the verification must PASS (no spurious
    recompiles) and the executable must run."""
    x = jnp.ones((4, 8))
    fmt = x.format
    fn = layouts.compile_pinned(lambda a: a * 2, (x,), (fmt,), fmt)
    np.testing.assert_allclose(np.asarray(fn(x)), 2.0)


def _observe_cache_flag_during_jit(monkeypatch, flags):
    orig_jit = jax.jit

    def spy_jit(*a, **kw):
        flags.append(jax.config.jax_enable_compilation_cache)
        return orig_jit(*a, **kw)

    monkeypatch.setattr(layouts.jax, "jit", spy_jit)


def test_compile_pinned_bypasses_cache_for_concrete_formats(monkeypatch, no_cache_dir):
    """Concretely-pinned compiles must run with the persistent cache
    DISABLED (the cache key omits layout constraints and cache-loaded
    metadata echoes the request — a collision is neither avoidable nor
    detectable after the fact)."""
    x = jnp.ones((4, 8))
    fmt = x.format
    flags = []
    _observe_cache_flag_during_jit(monkeypatch, flags)
    fn = layouts.compile_pinned(lambda a: a * 2, (x,), (fmt,), fmt)
    np.testing.assert_allclose(np.asarray(fn(x)), 2.0)
    assert flags == [False]
    assert jax.config.jax_enable_compilation_cache  # restored


def test_compile_pinned_bypasses_cache_for_auto_too(monkeypatch, no_cache_dir):
    """AUTO compiles must ALSO bypass the persistent cache: a cache-loaded
    executable's format metadata reports phantom layouts (observed: an
    AUTO cache hit claimed a layout no primitive — not even host->device
    device_put — could construct), and pinning reads its truth from that
    metadata."""
    from jax.experimental.layout import Format, Layout

    x = jnp.ones((4, 8))
    auto = Format(Layout.AUTO)
    flags = []
    _observe_cache_flag_during_jit(monkeypatch, flags)
    fn = layouts.compile_pinned(lambda a: a * 3, (x,), (auto,), auto)
    np.testing.assert_allclose(np.asarray(fn(x)), 3.0)
    assert flags == [False]


def test_pinned_init_bypasses_cache_and_truth_checks(monkeypatch, no_cache_dir):
    """pinned_init compiles with the cache disabled and checks the ACTUAL
    buffer formats of the created state (cache-loaded executables'
    output_formats metadata echoes the request, so only buffer truth
    counts)."""
    fmt = jnp.zeros((3, 5)).format
    flags = []
    _observe_cache_flag_during_jit(monkeypatch, flags)
    state = layouts.pinned_init(lambda: jnp.ones((3, 5)), fmt)
    np.testing.assert_allclose(np.asarray(state), 1.0)
    assert flags == [False]
    assert jax.config.jax_enable_compilation_cache


def test_pinned_init_repairs_off_format_leaves(monkeypatch):
    """If the created state's buffer formats deviate from the request,
    pinned_init routes it through place_in_formats."""
    fmt = jnp.zeros((3, 5)).format
    calls = []
    monkeypatch.setattr(layouts, "formats_agree", lambda req, act: False)
    real_place = layouts.place_in_formats
    monkeypatch.setattr(
        layouts, "place_in_formats",
        lambda tree, f, label: calls.append(label) or real_place(
            tree, f, label))
    state = layouts.pinned_init(lambda: jnp.ones((3, 5)), fmt)
    assert state.shape == (3, 5)
    assert calls == ["pinned init state"]
