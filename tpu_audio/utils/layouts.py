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

import jax

from tpu_audio.utils.log import Log


def backend_supports_layouts() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001 - no devices at all
        return False


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
    compiled = jax.jit(
        fn, donate_argnums=(0,) if donate_state else (),
        in_shardings=in_sh, out_shardings=out_sh,
    ).lower(*example_args).compile()
    got_state_fmt = compiled.input_formats[0][0]
    return compiled, got_state_fmt


def pinned_init(init_fn, state_fmt):
    """Create engine state DIRECTLY in the pinned layouts.

    `jax.device_put(default_layout_state, fmt)` transiently double-holds
    the whole state (default + relayouted copy) — at ~5 GB of cascade
    state (1280 voices x 4 s) that is an HBM OOM. Jitting the init with
    ``out_shardings=state_fmt`` materializes it once, already laid out.
    """
    return jax.jit(init_fn, out_shardings=state_fmt)()


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
