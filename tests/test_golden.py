"""Golden-trajectory regression: bit-stability of the fused sim across
rounds of development.

The reference's BASELINE asks for "bit-comparable trajectories vs the C++
single-thread sim"; the C++ cannot be built in this image (no Eigen), so
the anchor is a frozen golden trace of this framework's own CPU float32
rollout (deterministic: fixed PRNG key, fixed cadences). Any future change
that alters the physics, controllers, codecs, estimator, or timing
semantics will show up as a diff here and must be justified.

Regenerate with: python -m tests.test_golden  (after intentional changes)
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = pathlib.Path(__file__).parent / "golden" / "hover_traj_v1.npz"


def _run_reference_rollout():
    from agrifly_tpu.sim import env

    params = env.make_params(noise_scale=1.0)
    state = env.init_state(params, jax.random.PRNGKey(1234))
    cmd = env.hover_command((0.3, -0.2, 1.2))
    rollout = jax.jit(env.rollout, static_argnums=(3, 4))
    final, traj = rollout(params, state, cmd, 1500, True)  # 3 s, mocap mode
    idx = np.arange(0, 1500, 50)
    return {
        "pos": np.asarray(traj.pos)[idx],
        "vel": np.asarray(traj.vel)[idx],
        "att": np.asarray(traj.att)[idx],
        "motor_speeds": np.asarray(traj.motor_speeds)[idx],
        "final_kf_pos": np.asarray(final.logic.kf.pos),
        "final_mocap_pos": np.asarray(final.mocap.pos),
    }


def test_golden_hover_trajectory():
    if not GOLDEN.exists():
        import pytest

        pytest.skip("golden trace not generated yet")
    got = _run_reference_rollout()
    ref = np.load(GOLDEN)
    for k in ref.files:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=0, atol=1e-5,
            err_msg=f"golden mismatch in {k} — physics/control semantics changed",
        )


if __name__ == "__main__":
    GOLDEN.parent.mkdir(exist_ok=True)
    data = _run_reference_rollout()
    np.savez_compressed(GOLDEN, **data)
    print(f"wrote {GOLDEN}")
