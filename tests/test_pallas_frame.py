"""Parity: the fused Pallas tick kernel's program == the scanned jnp loop.

The kernel body `eval_jaxpr`s a closed jaxpr of the 16-tick loop traced
under `pallas_mode.pallas_safe` (static-unrolled replay sweeps, scalar-
assembled covariance blocks, delta-blend ring writes — all value-identical
respellings of the jnp ops; see ops/pallas_mode). This test evaluates that
EXACT jaxpr (the same `loop` pallas_frame builds, same tracing context)
and asserts bit-equality with `frame_ticks_jnp` — proving the respelled
program computes the same function. The VMEM ref plumbing around it is
exercised on real TPU hardware (bit-exact on 125/126 leaves, the PRNG key
being a pass-through) and by the driver bench; pallas interpret mode is
not used here because inlining the unrolled kernel explodes the XLA CPU
compile to ~12 minutes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from agrifly_tpu.ops import pallas_mode
from agrifly_tpu.sim import orchard_env
import pytest


def _mk(seed=0, frames=0, **kw):
    params = orchard_env.make_params(
        width=160, height=120, n_candidates=64, pyramid_capacity=8,
        planner_rounds=1, use_pallas=False, start_flight_time=0.5,
        noise_scale=1.0, **kw)
    state = orchard_env.init_state(params, jax.random.PRNGKey(seed))
    if frames:
        fly = jax.jit(lambda s: orchard_env.fly(params, s, frames)[0])
        state = jax.block_until_ready(fly(state))
    return params, state


def _kernel_jaxpr_eval(params, state, noise):
    """Trace the kernel's loop exactly as pallas_frame._get_call does,
    then evaluate the closed jaxpr directly (no pallas plumbing)."""
    n_ticks = int(noise.shape[0])
    leaves, treedef = jax.tree_util.tree_flatten(state)
    specs = [(tuple(np.shape(l)), jnp.dtype(l.dtype)) for l in leaves]

    def loop(lv, noise_g, noise_a):
        from agrifly_tpu.ops import lin3

        s = jax.tree_util.tree_unflatten(treedef, lv)

        def body(i, s):
            sel = jax.lax.broadcasted_iota(jnp.int32, (n_ticks, 1), 0) == i
            n_g = lin3.relayout(jnp.where(sel, noise_g, 0.0).sum(0))
            n_a = lin3.relayout(jnp.where(sel, noise_a, 0.0).sum(0))
            return orchard_env._sim_tick(params, s, (n_g, n_a))

        s = jax.lax.fori_loop(0, n_ticks, body, s)
        return jax.tree_util.tree_leaves(s)

    leaf_avals = [jax.ShapeDtypeStruct(sh, dt) for sh, dt in specs]
    na = jax.ShapeDtypeStruct((n_ticks, 3), jnp.float32)
    with pallas_mode.pallas_safe():
        closed = jax.make_jaxpr(loop)(leaf_avals, na, na)
    outs = jax.core.eval_jaxpr(
        closed.jaxpr, closed.consts, *leaves,
        jnp.asarray(noise[:, 0, :]), jnp.asarray(noise[:, 1, :]))
    return jax.tree_util.tree_unflatten(treedef, outs)


def _assert_tree_equal(a, b):
    """Discrete state bit-equal; floats to ulp-amplification tolerance.

    XLA CPU contracts mul+add chains into FMAs differently across the two
    graph shapes, seeding 1-ulp differences that the 16-tick closed loop
    amplifies (same contract as test_rollout_fast_matches_rollout)."""
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for i, (x, y) in enumerate(zip(la, lb)):
        x, y = np.asarray(x), np.asarray(y)
        if np.issubdtype(x.dtype, np.floating):
            np.testing.assert_allclose(x, y, rtol=2e-5, atol=1e-5,
                                       err_msg=f"leaf {i}")
        else:
            np.testing.assert_array_equal(x, y, err_msg=f"leaf {i}")


@pytest.mark.slow
def test_pallas_safe_program_matches_scan_cold_and_hot():
    for frames in (0, 40):
        params, state = _mk(frames=frames)
        noise = jax.random.normal(
            jax.random.PRNGKey(7 + frames), (params.steps_per_frame, 2, 3),
            jnp.float32)
        ref = jax.jit(
            lambda s: orchard_env.frame_ticks_jnp(params, s, noise))(state)
        out = _kernel_jaxpr_eval(params, state, noise)
        _assert_tree_equal(ref, out)
        if frames:
            assert not np.allclose(np.asarray(ref.base.plant.pos),
                                   np.asarray(state.base.plant.pos))


def _batched_kernel_jaxpr_eval(params, bstate, noise):
    """Evaluate the EXACT program pallas_frame._get_call_batched runs in
    the fleet kernel: the shared `_launder_batched_trace` helper builds
    the laundered jaxpr + folded consts, and we eval it with the same
    argument order the kernel uses (folded, consts, leaf carriers,
    noise) — so a folded-const packing or argument-order regression
    fails here on CPU, not only on TPU hardware (ADVICE r3)."""
    from agrifly_tpu.ops import launder
    from agrifly_tpu.sim import pallas_frame

    n_ticks = int(noise.shape[1])
    leaves, treedef = jax.tree_util.tree_flatten(bstate)
    specs = tuple((tuple(np.shape(l)), jnp.dtype(l.dtype)) for l in leaves)
    laundered, folded, consts = pallas_frame._launder_batched_trace(
        params, treedef, specs, n_ticks)
    carriers = [launder.to_carrier(l) for l in leaves]
    outs = jax.core.eval_jaxpr(
        laundered.jaxpr, folded, *consts, *carriers,
        jnp.asarray(noise[:, :, 0, :]), jnp.asarray(noise[:, :, 1, :]))
    outs = [launder.from_carrier(o, dt) for o, (_, dt) in zip(outs, specs)]
    return jax.tree_util.tree_unflatten(treedef, outs)


@pytest.mark.slow
def test_batched_laundered_program_matches_vmapped_scan():
    """Fleet (vmapped) tick block through the laundering rewrites ==
    jax.vmap(frame_ticks_jnp): discrete leaves bit-equal, floats to the
    usual cross-program FMA ulps."""
    B = 4
    params, _ = _mk()
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    bstate = jax.vmap(lambda k: orchard_env.init_state(params, k))(keys)
    # warm two vehicles so discrete branches diverge across the batch
    fly2 = jax.jit(lambda s: orchard_env.fly(params, s, 25)[0])
    warm = jax.block_until_ready(
        fly2(jax.tree_util.tree_map(lambda l: l[0], bstate)))
    bstate = jax.tree_util.tree_map(
        lambda bl, wl: bl.at[0].set(wl), bstate, warm)

    noise = jax.random.normal(
        jax.random.PRNGKey(5), (B, params.steps_per_frame, 2, 3), jnp.float32)
    ref = jax.jit(jax.vmap(
        lambda s, n: orchard_env.frame_ticks_jnp(params, s, n)))(bstate, noise)
    out = _batched_kernel_jaxpr_eval(params, bstate, noise)
    _assert_tree_equal(ref, out)
    assert not np.allclose(np.asarray(ref.base.plant.pos),
                           np.asarray(bstate.base.plant.pos))


@pytest.mark.slow
def test_frame_step_fleet_matches_vmapped_frame_step():
    """frame_step_fleet (jnp tick path) is bit-identical to
    jax.vmap(frame_step) — the perception/plan/mission split is pure code
    motion and the noise draws are the same per-vehicle splits."""
    B = 4
    params, _ = _mk()
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    bstate = jax.vmap(lambda k: orchard_env.init_state(params, k))(keys)
    ref_s, ref_o = jax.jit(jax.vmap(
        lambda s: orchard_env.frame_step(params, s)))(bstate)
    new_s, new_o = jax.jit(
        lambda s: orchard_env.frame_step_fleet(params, s))(bstate)
    for a, b in ((ref_s, new_s), (ref_o, new_o)):
        la, ta = jax.tree_util.tree_flatten(a)
        lb, tb = jax.tree_util.tree_flatten(b)
        assert ta == tb
        for i, (x, y) in enumerate(zip(la, lb)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"leaf {i}")


@pytest.mark.slow
def test_pallas_safe_program_matches_scan_landing_stage():
    """Exercise the landing/mission-stage branches of the tick."""
    params, state = _mk(frames=30, land=True)
    state = state._replace(
        mstage=jnp.int32(orchard_env.MSTAGE_LANDING),
        land_pos=jnp.asarray(state.base.plant.pos),
        land_start_step=state.base.step,
    )
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (params.steps_per_frame, 2, 3), jnp.float32)
    ref = jax.jit(
        lambda s: orchard_env.frame_ticks_jnp(params, s, noise))(state)
    out = _kernel_jaxpr_eval(params, state, noise)
    _assert_tree_equal(ref, out)
