"""Planner head-to-head vs the compiled reference DepthImagePlanner.

Both planners evaluate the IDENTICAL injected candidate list on the same
framework-rendered depth image (benchmarks/cpp_planner_oracle.py). The
reference's own ray-tracing ground truth (IsCollisionFreeGroundTruth)
provides the soundness bar: the framework must never label a trajectory
free that the reference ground truth says collides.

Slow-marked: compiles the reference planner on first use and renders
scenes on CPU.
"""

import shutil
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def oracle():
    if shutil.which("g++") is None:  # pragma: no cover
        pytest.skip("no g++ in image")
    from benchmarks import cpp_planner_oracle as H

    try:
        return H.ensure_oracle()
    except subprocess.CalledProcessError:  # pragma: no cover
        pytest.skip("reference planner does not build in this image")


def test_vs_reference_planner(oracle, tmp_path):
    import jax
    import jax.numpy as jnp

    from agrifly_tpu.planner import rappids
    from benchmarks import cpp_planner_oracle as H

    radii = (0.116, 0.174, 0.5)
    scenes = H.make_scenes(160, 120, 3)
    vel0 = jnp.array([0.0, 0.0, 1.5], jnp.float32)
    acc0 = jnp.zeros(3, jnp.float32)
    grav = jnp.array([0.0, 9.81, 0.0], jnp.float32)
    goal = jnp.array([0.0, 0.0, 50.0], jnp.float32)

    agree, fw_ff, cpp_ff, feas_mm, vel_mm, cost_rel = [], 0, 0, 0, 0, 0.0
    for k, (cam, depth) in enumerate(scenes):
        params = rappids.make_params(cam, true_radius=radii[0],
                                     plan_radius=radii[1],
                                     min_check_dist=radii[2])
        m = H.compare_on_scene(params, depth, jax.random.PRNGKey(500 + k),
                               vel0, acc0, grav, goal, 192, 32, radii,
                               tmp_path)
        agree.append(m["label_agreement"])
        fw_ff += m["fw_false_free"]
        cpp_ff += m["cpp_false_free"]
        feas_mm += m["feas_mismatch"]
        vel_mm += m["vel_mismatch"]
        cost_rel = max(cost_rel, m["cost_rel_max"])

    # identical candidate constructions -> identical costs/gates modulo f32
    assert cost_rel < 1e-4, f"cost mismatch {cost_rel:.2e}"
    assert feas_mm <= 2, f"{feas_mm} feasibility-gate mismatches"
    assert vel_mm <= 2, f"{vel_mm} velocity-gate mismatches"
    # SOUND vs the reference's own ray-tracing ground truth
    assert fw_ff == 0, f"{fw_ff} framework false-frees vs C++ ground truth"
    # collision labels may differ conservatively (different pyramid build
    # schedules) but must mostly agree
    assert np.mean(agree) > 0.85, f"label agreement {np.mean(agree):.3f}"
