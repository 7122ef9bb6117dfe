"""Compiler-chosen (AUTO) boundary layouts for state-threading loops.

XLA picks internal layouts per operator; when a jitted step's BOUNDARY
layout (the default row-major device layout) differs from what the
compiled program prefers, every call pays full-buffer layout-change
copies on the big state leaves. For the cascade engine's tail delay line
that was measured at 2x the entire steady-block budget (~400 MB/block of
pure relayout at 64 voices; see engine/cascade.py).

The fix is to let the compiler choose the boundary layouts too
(``Format(Layout.AUTO)``), then PIN every other jitted function that
threads the same state to those concrete formats — so steady steps,
crossfade steps, and collapses all agree and state never relayouts as it
flows between them. The reference has no analogue (cuFFT/CUDA kernels fix
their own layouts); this is pure XLA-boundary mechanics.

Only the TPU backend supports custom device layouts; on CPU the helpers
fall back to plain jit (same semantics, no pinning).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

from tpu_audio.utils.log import Log


def backend_supports_layouts() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001 - no devices at all
        return False


# --------------------------------------------------------------------------
# jax-0.9 layout-plumbing workarounds (all empirically confirmed on the TPU
# backend 2026-08-18; see tests/test_layout_guards.py for the host-side
# logic):
#
#   1. The PERSISTENT compilation cache key omits in_/out_shardings layout
#      constraints: a pinned compile can silently load a cache entry that
#      was compiled under DIFFERENT layouts (e.g. a plain-jit variant of
#      the same HLO written by an earlier process). The loaded executable
#      then strictly enforces the WRONG layouts — the "Computation was
#      compiled for input layouts that disagree" crash, or a silently
#      unpinned (up to 10x slower) session. WORSE: the loaded executable's
#      input_formats/output_formats METADATA ECHOES THE REQUEST rather
#      than the binary (a pinned init "verified" clean via output_formats,
#      then emitted default-layout leaves), so verification-after-compile
#      cannot catch a collision. The only safe play is to compile every
#      concretely-pinned function with the persistent cache DISABLED —
#      honest compiles honor entry layouts (measured across the full leg
#      set), and skipping the WRITE also stops pinned entries from
#      poisoning plain-jit users of the same HLO.
#   2. jax.device_put(arr, format) honors the Format for host arrays and
#      COMMITTED device arrays, but silently KEEPS the old layout for
#      UNCOMMITTED device-resident arrays — the array comes back
#      bit-identical but row-major. Repair: commit first (device_put to
#      the Format's sharding), then relayout.
#   3. A jitted identity with out_shardings=fmt NORMALIZES exotic
#      layouts (observed: requested tiling (8,128) on a 6-D leaf came
#      back (4,128) with two axes swapped) — usable only as a last
#      resort, never as the primary relayout path.
#   4. device_put with a concrete Format lowers a RELAYOUT PROGRAM
#      through compile_or_get_cached — and the cache key omits layout
#      constraints (#1), so relayout programs targeting DIFFERENT
#      layouts of the same shape/dtype collide on one key. With a
#      persistent cache dir configured, device_put loads whichever
#      entry was written first and emits ITS layout, not the requested
#      one — the "backend refuses to relayout" failures of 2026-08-18
#      (bisect: the same device_put honors the same Format perfectly in
#      a process with no cache dir). All format placements must
#      therefore run under compilation_cache_disabled() from the FIRST
#      placement of that (shape, layout) in the process (the in-process
#      executable cache would pin a poisoned program for later calls).
# --------------------------------------------------------------------------


# Reentrancy/thread-safety for compilation_cache_disabled: the config
# flag and the memoized pair are PROCESS-GLOBAL, so overlapping uses
# (async-paging worker compiling a slot update while the session thread
# runs place_in_formats) must not restore cache-enabled state while the
# other's "bypassed" compile is still in flight. A depth counter under
# one lock: the first entry saves + disables, only the LAST exit
# restores. Threads that never use this context can still race the
# global flag — pinned-compile users must route through here.
import threading as _threading

_disable_lock = _threading.Lock()
_disable_depth = 0
_disable_saved = None  # (flag, have_cc, checked, used)


def _cc_module():
    """The private compilation_cache module, or None if the memoized
    globals this workaround patches no longer exist (jax upgrade)."""
    try:
        from jax._src import compilation_cache as _cc
        _cc._cache_initialized_mutex  # noqa: B018 - attribute probes
        _cc._cache_checked
        _cc._cache_used
        return _cc
    except (ImportError, AttributeError):
        return None


@contextmanager
def compilation_cache_disabled():
    """Temporarily disable jax's persistent compilation cache (workaround
    #1 above: its key omits layout constraints, so only a cache-bypassing
    compile is guaranteed to honor pinned formats).

    Toggling ``jax_enable_compilation_cache`` alone is NOT enough on
    jax 0.9: ``compilation_cache.is_cache_used()`` memoizes its decision
    in module globals (``_cache_checked``/``_cache_used``) on the FIRST
    compile of the process. Any earlier cache-enabled compile memoizes
    True, after which the flag is never consulted again — the "disabled"
    compile silently reads (and writes) the persistent cache anyway.
    That leak produced every phantom-layout failure of 2026-08-18: the
    "fresh" AUTO compiles inside bench were loading stale entries whose
    metadata claimed layouts no primitive could construct, while the
    same compile in a clean process (no cache dir) was honest. So this
    context manager also overrides the memoized pair, and is reentrant
    across threads (depth-counted: the cache stays disabled until the
    outermost user exits). All state probing happens BEFORE any global
    is flipped, so a moved private API degrades to flag-only disabling
    instead of leaving the process wedged."""
    global _disable_depth, _disable_saved
    _cc = _cc_module()
    with _disable_lock:
        _disable_depth += 1
        if _disable_depth == 1:
            flag = jax.config.jax_enable_compilation_cache
            if _cc is not None:
                with _cc._cache_initialized_mutex:
                    _disable_saved = (flag, True, _cc._cache_checked,
                                      _cc._cache_used)
                    _cc._cache_checked, _cc._cache_used = True, False
            else:
                _disable_saved = (flag, False, None, None)
            jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        with _disable_lock:
            _disable_depth -= 1
            if _disable_depth == 0:
                flag, have_cc, checked, used = _disable_saved
                _disable_saved = None
                jax.config.update("jax_enable_compilation_cache", flag)
                if have_cc and _cc is not None:
                    with _cc._cache_initialized_mutex:
                        _cc._cache_checked, _cc._cache_used = checked, used


_scoped_active = False


@contextmanager
def layout_scoped_cache(scope_key: str):
    """Persistent compilation cache scoped to a LAYOUT-DEDICATED
    subdirectory — the safe way to cache layout-constrained compiles.

    Workaround #1's root cause is that the cache KEY omits layout
    constraints, so entries compiled under different constraints collide
    on one key. A directory whose every entry was compiled under the
    SAME constraint signature cannot collide: probed on-chip 2026-08-19
    (/tmp/probe_lkc.py), a cache-LOADED constrained executable from such
    a directory is honest — identical input_formats metadata digest and
    bit-identical output vs the fresh compile, loading in 0.4 s where
    the compile took 1.4 s (production pinning compiles run 20-300 s,
    and are otherwise paid EVERY run by design). The 2026-08-18 phantom
    metadata came from cross-context collisions, not serialization.

    Yields True when the scoped cache is active; False when it fell back
    to a plain cache-bypassed window (no base cache dir configured, the
    private jax internals moved, or another cache-state context is
    active — a concurrent ``compilation_cache_disabled`` user means
    someone is compiling with the cache off right now, and flipping the
    global state under them trades a slow-but-correct fresh compile for
    a race). Interleaved disable-windows opening DURING a scoped window
    stay correct: they save scoped state and restore it; a disable
    window outliving the scoped exit restores "enabled + base dir",
    which is the normal operating state of every caller that can reach
    this path (a configured cache dir implies enabled)."""
    import hashlib
    import os

    global _scoped_active
    _cc = _cc_module()
    ok = False
    # ALL config mutations happen under the same lock the disable context
    # uses for its own state flips: a disable window opening between the
    # activity check and the flag writes could otherwise interleave (the
    # scoped enable overwriting the disable's flag — re-exposing its
    # cache-bypassed compiles to the scoped directory)
    with _disable_lock:
        base = jax.config.jax_compilation_cache_dir
        if (base and _cc is not None and hasattr(_cc, "reset_cache")
                and _disable_depth == 0 and not _scoped_active):
            _scoped_active = True
            sub = os.path.join(
                base, "layout_scoped",
                hashlib.sha1(scope_key.encode()).hexdigest()[:20])
            os.makedirs(sub, exist_ok=True)
            flag = jax.config.jax_enable_compilation_cache
            # reset_cache() discards the lazily-initialized cache OBJECT
            # (which pins the directory it was created with —
            # set_cache_dir alone only updates the config) and clears the
            # is_cache_used memoization, so the next compile
            # re-initializes against the scoped directory
            jax.config.update("jax_compilation_cache_dir", sub)
            jax.config.update("jax_enable_compilation_cache", True)
            _cc.reset_cache()
            ok = True
    if not ok:
        with compilation_cache_disabled():
            yield False
        return
    try:
        yield True
    finally:
        with _disable_lock:
            jax.config.update("jax_compilation_cache_dir", base)
            jax.config.update("jax_enable_compilation_cache", flag)
            _cc.reset_cache()
            _scoped_active = False


def _is_concrete(fmt) -> bool:
    """True for a fully-specified Format (participates in verification);
    False for None / AUTO placeholders (the compiler's choice is truth)."""
    if fmt is None:
        return False
    lay = getattr(fmt, "layout", None)
    return lay is not None and "AUTO" not in str(lay)


def formats_agree(requested, actual) -> bool:
    """Leafwise string comparison of two Format pytrees, skipping
    non-concrete requested leaves (None / AUTO)."""
    req = jax.tree.leaves(requested, is_leaf=lambda x: x is None)
    act = jax.tree.leaves(actual, is_leaf=lambda x: x is None)
    if len(req) != len(act):
        return False
    return all(not _is_concrete(r) or str(r) == str(a)
               for r, a in zip(req, act))


def tree_formats(tree):
    """Pytree of the concrete Formats of a tree of device arrays."""
    return jax.tree.map(lambda a: a.format, tree)


def place_in_formats(tree, fmt, label: str = "tree"):
    """Relayout `tree` into the concrete Formats `fmt`, defending against
    workaround #2 above: each leaf is device_put and VERIFIED against the
    actual buffer format (the one source of truth). A silently-kept old
    layout (the uncommitted-device-array no-op) is repaired via a
    cache-bypassing jitted identity — a real device computation whose
    output buffers are always honest. Leaves already in the right Format
    pass through untouched (no transfer, no copy); repair is per-leaf so
    transient double-buffering is bounded by the largest leaf, never the
    whole tree. Raises rather than returning off-format leaves (a
    committed mismatching leaf strictly crashes pinned executables
    mid-serving — better to fail here, at placement time)."""
    leaves, treedef = jax.tree.flatten(tree)
    fmts = jax.tree.leaves(fmt, is_leaf=lambda x: x is None)
    if len(leaves) != len(fmts):
        raise ValueError(f"place_in_formats({label}): tree has "
                         f"{len(leaves)} leaves but formats {len(fmts)}")
    out, repaired = [], 0
    for a, f in zip(leaves, fmts):
        if not _is_concrete(f) or str(getattr(a, "format", None)) == str(f):
            out.append(a)
            continue
        # EVERY rung under the (truly) disabled persistent cache: the
        # relayout program device_put lowers collides across target
        # layouts in the cache key (workaround #4) — an enabled
        # placement can load a wrong-layout transfer program and "refuse"
        with compilation_cache_disabled():
            b = jax.device_put(a, f)
            if str(b.format) != str(f):
                repaired += 1
                b = jax.jit(lambda t: t, out_shardings=f)(a)
            if str(b.format) != str(f):
                # identity-jit NORMALIZES some exotic layouts (#3);
                # host->device device_put honors arbitrary Formats when
                # cache-bypassed — pay the round-trip for this leaf
                import numpy as _np
                b = jax.device_put(_np.asarray(a), f)
        if str(b.format) != str(f):
            raise RuntimeError(
                f"place_in_formats({label}): backend refuses to "
                f"relayout {a.shape} {a.dtype} to {f} (got {b.format})")
        out.append(b)
    if repaired:
        Log.warn("layouts", "device_put silently kept old layouts on %d "
                 "leaf/leaves of %s; repaired via jitted identity",
                 repaired, label)
    return jax.tree.unflatten(treedef, out)


def compile_auto_layout(fn, example_args, donate_state: bool = True,
                        state_fmt=None, arg_fmts: dict | None = None):
    """jit ``fn(state, *rest)`` with compiler-chosen boundary layouts.

    Returns (compiled, state_format) where ``state_format`` is the pytree
    of concrete Formats the compiler picked for the first argument. Pass
    that as ``state_fmt`` when compiling OTHER functions over the same
    state so they agree (both their input and their first output are
    pinned to it, which in-place donation already forces); ``arg_fmts``
    pins additional positional args (e.g. the shared bank) the same way.

    ``compiled`` is an executable: call it with arrays (jax relayouts
    inputs on first use; steady-state threading is then copy-free).
    """
    from jax.experimental.layout import Format, Layout

    auto = Format(Layout.AUTO)
    state, *rest = example_args
    arg_fmts = arg_fmts or {}
    in_sh = (state_fmt if state_fmt is not None
             else jax.tree.map(lambda _: auto, state),
             *(arg_fmts.get(i + 1, jax.tree.map(lambda _: auto, r))
               for i, r in enumerate(rest)))
    # outputs: the threaded state leads; any extra outputs (the audio
    # block) stay AUTO — np.asarray handles arbitrary device layouts
    out_struct = jax.eval_shape(fn, *example_args)
    if isinstance(out_struct, tuple):
        out_sh = (in_sh[0], *(jax.tree.map(lambda _: auto, o)
                              for o in out_struct[1:]))
    else:
        out_sh = in_sh[0]
    compiled = compile_pinned(fn, example_args, in_sh, out_sh,
                              donate_argnums=(0,) if donate_state else ())
    got_state_fmt = compiled.input_formats[0][0]
    return compiled, got_state_fmt


def compile_pinned(fn, example_args, in_shardings, out_shardings,
                   donate_argnums=()):
    """AOT-compile ``fn`` with layout-constrained (AUTO or concrete)
    in/out formats, NEVER touching the base persistent compilation
    cache: its key omits layout constraints (a pinned compile can load a
    plain-jit twin and vice versa) AND a colliding entry's input_/
    output_formats metadata is untrustworthy — observed echoing the
    request on pinned compiles and reporting PHANTOM layouts on AUTO
    compiles (probe 2026-08-18). Layout pinning is built entirely on
    that metadata, so every compile it reads must come from an entry
    compiled under the SAME constraints. ``layout_scoped_cache`` routes
    the compile to a constraint-signature-dedicated cache directory
    (collision-free by construction; probed honest on-chip 2026-08-19),
    so repeat runs LOAD in under a second where the cache-bypassing
    policy re-paid 20-300 s pinning compiles every run; with no cache
    dir configured it degrades to the cache-bypassed fresh compile.
    Keeping pinned entries out of the base directory also stops them
    from poisoning plain-jit users of the same HLO.

    Layout-scoped caching (layout_scoped_cache) was tried here and
    REVERTED after on-chip bisection (2026-08-19, /tmp/probe_pin_cache
    series): a cache-LOADED layout-constrained executable computes
    bit-identical VALUES, but the layout-pinning FLOW built on it dies
    with INVALID_ARGUMENT at the next pinned call and poisons the
    device session — a loaded CONCRETE-pinned executable fails at its
    own input handler, and a loaded AUTO executable's claimed formats
    poison the downstream fns freshly pinned to them (the fresh twin of
    the identical sequence runs clean; took out 4 bench legs before the
    revert). Value-only consumers can cache safely; anything that READS
    layout metadata off the executable must compile fresh."""
    with compilation_cache_disabled():
        return jax.jit(
            fn, donate_argnums=donate_argnums,
            in_shardings=in_shardings, out_shardings=out_shardings,
        ).lower(*example_args).compile()


def pinned_init(init_fn, state_fmt):
    """Create engine state DIRECTLY in the pinned layouts.

    `jax.device_put(default_layout_state, fmt)` transiently double-holds
    the whole state (default + relayouted copy) — at ~5 GB of cascade
    state (1280 voices x 4 s) that is an HBM OOM. Jitting the init with
    ``out_shardings=state_fmt`` materializes it once, already laid out.

    Compiled with the persistent cache BYPASSED — including the
    layout-scoped variant: a scoped-cache-loaded init at 1024v cascade
    scale emitted off-format leaves whose repair itself failed with
    INVALID_ARGUMENT (bench 2026-08-19 12:10 — the truth-check+repair
    net below catches the deviation but cannot always CONSTRUCT the
    claimed layout from a poisoned loaded executable; the light-config
    probes that "validated" loading simply had round-trippable
    layouts). A BASE-cache key collision (module docstring, workaround
    #1) can likewise silently load a plain-init entry that ignores
    ``out_shardings`` with request-echoing metadata. The created
    state's ACTUAL buffer formats (the one source of truth) are checked
    afterwards and repaired via place_in_formats if the backend
    deviated."""
    with compilation_cache_disabled():
        state = jax.jit(init_fn, out_shardings=state_fmt)()
    if not formats_agree(state_fmt, tree_formats(state)):
        Log.warn("layouts", "pinned init emitted off-format leaves despite "
                 "a cache-bypassing compile; repairing via place_in_formats")
        state = place_in_formats(state, state_fmt, "pinned init state")
    return state


def pin_engine_steps(engine, bank, params, state, x, donate: bool = True,
                     collapse_params: bool = False):
    """Compile the cascade/coef engine's production functions with one
    consistent compiler-chosen state layout.

    ``state`` (and ``x``) may be real arrays OR ``ShapeDtypeStruct``
    trees (e.g. from ``jax.eval_shape`` of the init) — lowering never
    materializes them, so callers can pin layouts BEFORE allocating any
    state and then create it with :func:`pinned_init`.

    Strategy-aware: 'allk' engines get 'steady' + 'indexed' +
    'collapse_pure' (the span-fade production trio); 'selected' engines
    get 'steady' + 'full' (the general fade step, their production fade
    path) + 'collapse' (the materializing re-base — called on every
    re-select, so it must agree on the state layout or every fade entry
    pays a full-state relayout).

    Returns a dict with the executables and 'state_format' (None where
    unsupported by the backend — caller falls back to jit).
    """
    if not backend_supports_layouts():
        return None
    steady, state_fmt = compile_auto_layout(
        engine.step_coef_steady, (state, bank, params, x),
        donate_state=donate)
    bank_fmt = steady.input_formats[0][1]
    out = {"steady": steady, "state_format": state_fmt,
           "bank_format": bank_fmt}
    changed = params.select == params.select
    if getattr(engine, "mac_strategy", "allk") == "selected":
        full, _ = compile_auto_layout(
            engine.step_coef, (state, bank, params, x),
            donate_state=donate, state_fmt=state_fmt, arg_fmts={1: bank_fmt})
        c_args = [state, bank, params.select, changed, params.select]
        if getattr(engine, "collapse_takes_params", False):
            c_args.append(params)
        coll, _ = compile_auto_layout(
            engine.collapse, tuple(c_args), donate_state=donate,
            state_fmt=state_fmt, arg_fmts={1: bank_fmt})
        out.update(full=full, collapse=coll)
        Log.info("layouts", "pinned compiler-chosen state layouts across "
                 "steady/full/collapse steps ('selected' strategy)")
        return out
    indexed, _ = compile_auto_layout(
        engine.step_coef_indexed, (state, bank, params, x),
        donate_state=donate, state_fmt=state_fmt, arg_fmts={1: bank_fmt})
    cp_args = ((state, params.select, changed, params)
               if collapse_params
               else (state, params.select, changed))
    collapse, _ = compile_auto_layout(
        engine.collapse_pure, cp_args, donate_state=donate,
        state_fmt=state_fmt)
    Log.info("layouts", "pinned compiler-chosen state layouts across "
             "steady/indexed/collapse steps")
    out.update(indexed=indexed, collapse_pure=collapse)
    return out


def format_keyed_executable(holder, fmt, build,
                            attr: str = "_slot_update_cache"):
    """Per-layout executable cache shared by the engines' bank-slot
    updates (fmajor/cascade ``update_bank_slot``).

    Executables bake in the bank's layouts, which change when a session
    pins compiler-chosen layouts after the first fault — a stale
    executable would emit a default-layout bank that every pinned step
    relayouts per block (measured 10x session slowdown). A DICT keyed by
    ``str(fmt)`` (not a single mutable (executable, key) attribute pair)
    because the async pager's worker thread and the session thread may
    race here: per-key entries stay internally consistent under any
    interleaving, a torn pair would not. ``build()`` is called at most
    once per key per thread (a benign double-compile if two threads race
    the same new key)."""
    cache = getattr(holder, attr, None)
    if cache is None:
        cache = {}
        setattr(holder, attr, cache)
    key = str(fmt)
    fn = cache.get(key)
    if fn is None:
        fn = build()
        cache[key] = fn
    return fn
