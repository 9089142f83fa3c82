"""Parity: the fused Pallas tick kernel == the scanned jnp tick loop.

The kernel body traces the *same* `_sim_tick` code on ref-loaded values, so
the contract is bit-exactness (like render/pallas_raycast): every state
leaf equal after a full 16-tick frame, from both a cold (pre-flight) state
and a hot mid-flight state with an adopted trajectory being tracked.
"""

import jax
import jax.numpy as jnp
import numpy as np

from agrifly_tpu.sim import orchard_env, pallas_frame


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


def _assert_tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for i, (x, y) in enumerate(zip(la, lb)):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=f"leaf {i} ({ta.flatten_up_to(a)[i].dtype})")


def test_fused_frame_matches_scan_cold_and_hot():
    for frames in (0, 40):
        params, state = _mk(frames=frames)
        noise = jax.random.normal(
            jax.random.PRNGKey(7 + frames), (params.steps_per_frame, 2, 3),
            jnp.float32)
        ref = jax.jit(
            lambda s: orchard_env.frame_ticks_jnp(params, s, noise))(state)
        out = jax.jit(
            lambda s: pallas_frame.frame_ticks(params, s, noise,
                                               interpret=True))(state)
        _assert_tree_equal(ref, out)
        # the frame did real work: plant moved or motors commanded
        if frames:
            assert not np.allclose(np.asarray(ref.base.plant.pos),
                                   np.asarray(state.base.plant.pos))


def test_fused_frame_matches_scan_landing_stage():
    """Exercise the landing/mission-stage branches of the tick."""
    params, state = _mk(frames=30, land=True)
    # force the landing stage
    state = state._replace(
        mstage=jnp.int32(orchard_env.MSTAGE_LANDING),
        land_pos=jnp.asarray(state.base.plant.pos),
        land_start_step=state.base.step,
    )
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (params.steps_per_frame, 2, 3), jnp.float32)
    ref = jax.jit(
        lambda s: orchard_env.frame_ticks_jnp(params, s, noise))(state)
    out = jax.jit(
        lambda s: pallas_frame.frame_ticks(params, s, noise,
                                           interpret=True))(state)
    _assert_tree_equal(ref, out)
