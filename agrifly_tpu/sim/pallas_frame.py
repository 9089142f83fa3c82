"""Fused 16-tick orchard frame as ONE Pallas TPU kernel.

The single-vehicle perception-plan-act frame (Rappids_Simulator/main.cpp:
330-760 demo loop) is latency-bound at B=1: the scanned jnp tick chain
compiles to ~320 tiny fusion kernels per 2 ms tick (~1.8 us launch latency
each on a v5e), so the 16-tick block costs 9.3 ms of an 11.4 ms frame while
doing microseconds of actual arithmetic. This module runs the whole tick
block — radio delay ring, plant integration, IMU fabrication, the complete
onboard logic (EKF, controllers, mixer), the mocap estimator with its
prediction-pipe replay, and the offboard tracking controller — inside one
`pl.pallas_call`, eliminating the per-op dispatch entirely.

Design: the kernel *reuses the exact jnp tick code*. The 16-tick loop
(`orchard_env._sim_tick` under `lax.fori_loop`) is traced once to a closed
jaxpr with the estimator's 8-slot replay sweeps statically unrolled
(`estimators.replay_static_unroll` — bitwise-identical op order) and IMU
noise pre-drawn outside as a (16, 2, 3) normal block (no threefry in the
kernel). The jaxpr's array constants (gravity vectors, mixer signs, baked
vehicle parameters, ...) become extra kernel inputs — Pallas forbids
captured array constants — and the kernel body just `eval_jaxpr`s the very
same computation on ref-loaded values. The tick path is pure elementwise /
one-hot VPU math by construction (no gathers, no tiny dot_generals; see
ops/lin3.mv3 and the delayline/pipe one-hot design), so it lowers through
Mosaic unchanged.

Parity: tests/test_pallas_frame.py runs this kernel in interpret mode on
CPU against `orchard_env.frame_ticks_jnp` — bit-exact state equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _canon_shape(shape):
    """Canonical >=2-D VMEM shape for a leaf."""
    if len(shape) == 0:
        return (1, 1)
    if len(shape) == 1:
        return (1, shape[0])
    return tuple(shape)


def _io_dtype(dtype):
    """bool rides as int32 (i1 VMEM I/O is unreliable in Mosaic)."""
    return jnp.dtype(jnp.int32) if jnp.dtype(dtype) == jnp.bool_ else jnp.dtype(dtype)


def _pack(x):
    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    return x.reshape(_canon_shape(x.shape))


def _load(ref, shape, dtype):
    v = ref[...]
    # index/reshape BEFORE the bool cast: Mosaic can't squeeze i1 scalars
    if len(shape) == 0:
        v = v[0, 0]
    elif len(shape) == 1:
        v = v[0, :]
    if jnp.dtype(dtype) == jnp.bool_:
        v = v != 0
    return v


def _unpack(x, shape, dtype):
    if jnp.dtype(dtype) == jnp.bool_:
        x = x.astype(jnp.bool_)
    return x.reshape(shape)


# (params identity, treedef, leaf avals, n_ticks, interpret) -> callable
_CACHE = {}


def _get_call(params, treedef, specs, n_ticks, interpret):
    key = (id(params), treedef, specs, n_ticks, interpret)
    hit = _CACHE.get(key)
    if hit is not None and hit[0] is params:
        return hit[1]

    from agrifly_tpu.offboard import estimators
    from agrifly_tpu.sim import orchard_env

    def loop(leaves, noise_g, noise_a):
        s = jax.tree_util.tree_unflatten(treedef, leaves)

        def body(i, s):
            # one-hot row select (gather-free; exact: single nonzero term);
            # 2-D int-compared mask + sublane sum, then relayout-laundered
            # (reduced rank-1s meeting rotated loop carries crash Mosaic
            # layout inference — see ops/lin3.relayout)
            from agrifly_tpu.ops import lin3

            sel = jax.lax.broadcasted_iota(jnp.int32, (n_ticks, 1), 0) == i
            n_g = lin3.relayout(jnp.where(sel, noise_g, 0.0).sum(0))  # (3,)
            n_a = lin3.relayout(jnp.where(sel, noise_a, 0.0).sum(0))
            return orchard_env._sim_tick(params, s, (n_g, n_a))

        s = jax.lax.fori_loop(0, n_ticks, body, s)
        return jax.tree_util.tree_leaves(s)

    leaf_avals = [jax.ShapeDtypeStruct(sh, dt) for sh, dt in specs]
    noise_aval = jax.ShapeDtypeStruct((n_ticks, 3), jnp.float32)
    with estimators.replay_static_unroll():
        closed = jax.make_jaxpr(loop)(leaf_avals, noise_aval, noise_aval)
    # a captured const may be a TRACER of the enclosing jit trace (the
    # topic bridge passes start_flight_step as a traced argument so a
    # teleop arm never recompiles the paced loop); consts already enter
    # the pallas_call as ordinary inputs, so a traced one rides the same
    # slot — only the host-side numpy packing must not touch it
    consts = list(closed.consts)
    const_specs = tuple((tuple(c.shape), jnp.dtype(c.dtype)) for c in consts)

    def kernel(*refs):
        nc, nl = len(consts), len(specs)
        const_refs = refs[:nc]
        ng_ref, na_ref = refs[nc], refs[nc + 1]
        in_refs = refs[nc + 2:nc + 2 + nl]
        out_refs = refs[nc + 2 + nl:]
        const_vals = [
            _load(r, sh, dt) for r, (sh, dt) in zip(const_refs, const_specs)
        ]
        leaves = [_load(r, sh, dt) for r, (sh, dt) in zip(in_refs, specs)]
        outs = jax.core.eval_jaxpr(
            closed.jaxpr, const_vals, *leaves, ng_ref[...], na_ref[...])
        for r, v, (sh, dt) in zip(out_refs, outs, specs):
            out = jnp.asarray(v)
            if jnp.dtype(dt) == jnp.bool_:
                out = out.astype(jnp.int32)
            r[...] = out.reshape(_canon_shape(sh))

    out_shapes = [
        jax.ShapeDtypeStruct(_canon_shape(sh), _io_dtype(dt))
        for sh, dt in specs
    ]
    n_inputs = len(consts) + 2 + len(specs)
    call_ = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(specs),
        interpret=interpret,
    )
    # keep concrete consts as NUMPY in the closure: jnp arrays
    # materialized during the first outer-jit trace would leak that
    # trace's tracers into the cache (np converts to on-device constants
    # at each trace, free). A tracer const is packed with jnp ops in its
    # own trace — the cache guard (`hit[0] is params`) confines the entry
    # to the params instance built inside that same trace.
    def _pack_const(x):
        if isinstance(x, jax.core.Tracer):
            if x.dtype == jnp.bool_:
                x = x.astype(jnp.int32)
            return x.reshape(_canon_shape(x.shape))
        x = np.asarray(x)
        if x.dtype == np.bool_:
            x = x.astype(np.int32)
        return x.reshape(_canon_shape(x.shape))

    packed_consts = [_pack_const(c) for c in consts]

    def call(packed_leaves, noise_g, noise_a):
        return call_(*packed_consts, noise_g, noise_a, *packed_leaves)

    # the cache VALUE keeps a strong reference to `params`, so its id can
    # never be reused by a different (GC'd-and-reallocated) params object
    _CACHE[key] = (params, call)
    return call


def _trace_batched_loop(params, treedef, specs, n_ticks):
    """Closed jaxpr of the vmapped B-vehicle tick block (the exact program
    _get_call_batched evaluates in-kernel; also evaluated directly by the
    parity tests)."""
    from agrifly_tpu.offboard import estimators
    from agrifly_tpu.sim import orchard_env

    B = specs[0][0][0]

    def loop(leaves, noise_g, noise_a):
        s = jax.tree_util.tree_unflatten(treedef, leaves)

        def one_env(s1, ng, na):
            def body(i, s1):
                from agrifly_tpu.ops import lin3

                sel = jax.lax.broadcasted_iota(jnp.int32, (n_ticks, 1), 0) == i
                n_g = lin3.relayout(jnp.where(sel, ng, 0.0).sum(0))
                n_a = lin3.relayout(jnp.where(sel, na, 0.0).sum(0))
                return orchard_env._sim_tick(params, s1, (n_g, n_a))

            return jax.lax.fori_loop(0, n_ticks, body, s1)

        out = jax.vmap(one_env)(s, noise_g, noise_a)
        return jax.tree_util.tree_leaves(out)

    leaf_avals = [jax.ShapeDtypeStruct(sh, dt) for sh, dt in specs]
    noise_aval = jax.ShapeDtypeStruct((B, n_ticks, 3), jnp.float32)
    with estimators.replay_static_unroll():
        return jax.make_jaxpr(loop)(leaf_avals, noise_aval, noise_aval)


def _launder_batched_trace(params, treedef, specs, n_ticks):
    """Laundered (Mosaic-lowerable) trace of the vmapped tick block plus
    its constant carriers: returns (laundered, folded, consts) where
    `laundered.jaxpr` is evaluated as
    eval_jaxpr(laundered.jaxpr, folded, *consts, *leaf_carriers, ng, na).

    The laundering runs OUTSIDE the kernel, via `jax.make_jaxpr` over
    `launder.eval_jaxpr`: any literal-only equation it constant-folds
    (e.g. a broadcast of scalar 0 to i32[1] introduced by vmap) would
    otherwise materialize as a captured array constant inside the kernel
    trace, which Pallas rejects. Folded concretes surface as the
    laundered trace's consts and ride into the kernel as extra inputs.

    Shared by _get_call_batched and the parity test
    (tests/test_pallas_frame.py) so the test evaluates EXACTLY the
    program the kernel evaluates (ADVICE r3).
    """
    from agrifly_tpu.ops import launder

    closed = _trace_batched_loop(params, treedef, specs, n_ticks)
    for c in closed.consts:
        if isinstance(c, jax.core.Tracer):
            raise NotImplementedError(
                "batched tick kernel captured a traced const (e.g. a "
                "traced params leaf); only the single-vehicle kernel "
                "supports those — close over concrete params here")
    consts = [launder._np_carrier(c) for c in closed.consts]
    const_specs = tuple((tuple(c.shape), jnp.dtype(c.dtype)) for c in consts)

    B = specs[0][0][0]
    const_avals = [jax.ShapeDtypeStruct(sh, dt) for sh, dt in const_specs]
    carrier_avals = [jax.ShapeDtypeStruct(sh, _io_dtype(dt)) for sh, dt in specs]
    noise_aval = jax.ShapeDtypeStruct((B, n_ticks, 3), jnp.float32)
    laundered = jax.make_jaxpr(
        lambda cs, ls, ng, na: launder.eval_jaxpr(closed.jaxpr, cs, *ls, ng, na)
    )(const_avals, carrier_avals, noise_aval, noise_aval)
    # ADVICE r3: _np_carrier would ship a bool const as int32 while the
    # constvar aval stays bool, and eval_jaxpr does no conversion — a
    # bool-consuming eqn would silently receive int32. No bool consts
    # arise today; fail loudly if the laundering ever leaves one.
    for c in laundered.consts:
        if jnp.dtype(c.dtype) == jnp.bool_:
            raise AssertionError(
                "laundered trace captured a bool const; launder must "
                "rewrite bools to int32 carriers")
    folded = [launder._np_carrier(c) for c in laundered.consts]
    return laundered, folded, consts


def _get_call_batched(params, treedef, specs, n_ticks, interpret):
    """Batched (fleet) variant: one kernel advances B vehicles 16 ticks.

    The loop is `jax.vmap` of the single-vehicle tick chain — value-wise
    exactly the fleet path's scanned jnp program — but vmap's batching
    rules emit i1-vector reshapes/broadcasts and minor-dim concatenates
    of (B, 1) pieces that Mosaic cannot lower, so the kernel body
    re-evaluates the jaxpr through ops/launder.eval_jaxpr (bool->int32
    carriers, masked-select column assembly; value-identical rewrites).
    Bool leaves ride as int32 carriers end-to-end: packed by _pack,
    loaded without the ->bool conversion, and converted back only after
    the pallas_call returns.
    """
    key = ("batched", id(params), treedef, specs, n_ticks, interpret)
    hit = _CACHE.get(key)
    if hit is not None and hit[0] is params:
        return hit[1]

    laundered, folded, consts = _launder_batched_trace(
        params, treedef, specs, n_ticks)
    const_specs = tuple((tuple(c.shape), jnp.dtype(c.dtype)) for c in consts)
    folded_specs = tuple((tuple(c.shape), jnp.dtype(c.dtype)) for c in folded)

    def _load_carrier(ref, shape):
        v = ref[...]
        if len(shape) == 0:
            return v[0, 0]
        if len(shape) == 1:
            return v[0, :]
        return v

    def kernel(*refs):
        nf, nc, nl = len(folded), len(consts), len(specs)
        folded_refs = refs[:nf]
        const_refs = refs[nf:nf + nc]
        ng_ref, na_ref = refs[nf + nc], refs[nf + nc + 1]
        in_refs = refs[nf + nc + 2:nf + nc + 2 + nl]
        out_refs = refs[nf + nc + 2 + nl:]
        folded_vals = [
            _load_carrier(r, sh) for r, (sh, _) in zip(folded_refs, folded_specs)
        ]
        const_vals = [
            _load_carrier(r, sh) for r, (sh, _) in zip(const_refs, const_specs)
        ]
        leaves = [_load_carrier(r, sh) for r, (sh, _) in zip(in_refs, specs)]
        outs = jax.core.eval_jaxpr(
            laundered.jaxpr, folded_vals, *const_vals, *leaves,
            ng_ref[...], na_ref[...])
        for r, v, (sh, dt) in zip(out_refs, outs, specs):
            r[...] = jnp.asarray(v).reshape(_canon_shape(sh))

    out_shapes = [
        jax.ShapeDtypeStruct(_canon_shape(sh), _io_dtype(dt))
        for sh, dt in specs
    ]
    n_inputs = len(folded) + len(consts) + 2 + len(specs)
    call_ = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(specs),
        interpret=interpret,
    )
    packed_consts = [c.reshape(_canon_shape(c.shape))
                     for c in (*folded, *consts)]

    def call(packed_leaves, noise_g, noise_a):
        return call_(*packed_consts, noise_g, noise_a, *packed_leaves)

    _CACHE[key] = (params, call)
    return call


def frame_ticks_batched(params, state, noise, interpret=False):
    """Advance a B-vehicle fleet one tick block in a single kernel launch.

    state: OrchardEnvState with a leading batch axis on every leaf.
    noise: (B, n_ticks, 2, 3) pre-drawn unit normals. Value-parity with
    jax.vmap(frame_ticks_jnp) to the usual cross-program FMA ulps
    (discrete leaves bit-equal; tests/test_pallas_frame.py).
    """
    n_ticks = int(noise.shape[1])
    leaves, treedef = jax.tree_util.tree_flatten(state)
    specs = tuple((tuple(np.shape(l)), jnp.dtype(l.dtype)) for l in leaves)
    call = _get_call_batched(params, treedef, specs, n_ticks, bool(interpret))

    packed = [_pack(l) for l in leaves]
    noise = jnp.asarray(noise, jnp.float32)
    out = call(packed, noise[:, :, 0, :], noise[:, :, 1, :])
    new_leaves = [_unpack(o, sh, dt) for o, (sh, dt) in zip(out, specs)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def frame_ticks(params, state, noise, interpret=False):
    """Run the frame's tick block as one kernel launch.

    params: OrchardEnvParams (arrays bake into the traced jaxpr's consts,
    shipped to the kernel as inputs). state: OrchardEnvState (single
    vehicle, unbatched). noise: (n_ticks, 2, 3) pre-drawn unit normals
    (gyro, acc) matching frame_step's batched draw.
    """
    n_ticks = int(noise.shape[0])
    leaves, treedef = jax.tree_util.tree_flatten(state)
    specs = tuple((tuple(np.shape(l)), jnp.dtype(l.dtype)) for l in leaves)
    call = _get_call(params, treedef, specs, n_ticks, bool(interpret))

    packed = [_pack(l) for l in leaves]
    noise = jnp.asarray(noise, jnp.float32)
    out = call(packed, noise[:, 0, :], noise[:, 1, :])
    new_leaves = [_unpack(o, sh, dt) for o, (sh, dt) in zip(out, specs)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
