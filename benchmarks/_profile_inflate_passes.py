"""Per-pass cost breakdown of the inflation kernel (pallas_inflate).

Times the kernel with trace-time pass subsets gated out
(inflate_pyramids(_skip_passes=...)); consecutive differences isolate each
pass: A (initial-rect check), expand (max-sweep while_loop), B (rect min
depth), C (4 edge bands), D (4 corner bands). Outputs are garbage when
passes are skipped — this is timing-only.

    python -m benchmarks._profile_inflate_passes [--cpu] [--seeds 32]
"""

import sys

from benchmarks import _util


def main(argv):
    argv = _util.force_cpu_if_flagged(argv)
    n_seeds = int(argv[argv.index("--seeds") + 1]) if "--seeds" in argv else 32

    import jax
    import jax.numpy as jnp

    from agrifly_tpu.ops import rotation as rot
    from agrifly_tpu.planner import pallas_inflate, rappids, traj as traj_mod
    from agrifly_tpu.render import orchard, pallas_raycast, raycast

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = raycast.make_config(640, 480, far=10.0, dda_steps=8)
    scene = orchard.make_params(seed=0)
    cam = rappids.make_camera(640, 480, focal=320.0, depth_scale=10.0 / 256.0)
    params = rappids.make_params(cam, true_radius=0.116, plan_radius=0.174,
                                 min_check_dist=0.5)
    cam_att = raycast.camera_attitude(rot.identity())
    pos = jnp.array([5.0, 0.0, 2.5], jnp.float32)
    if on_tpu:
        depth = pallas_raycast.render_depth_batch(
            cfg, scene, pos[None], cam_att[None])[0]
    else:
        depth = raycast.render_depth(cfg, scene, pos, cam_att)
    depth = jax.block_until_ready(depth)

    vel = jnp.array([0.0, 0.0, 1.5], jnp.float32)
    acc = jnp.zeros(3, jnp.float32)
    grav = jnp.array([0.0, 9.81, 0.0], jnp.float32)
    tr = rappids.sample_candidates(params, jax.random.PRNGKey(1), 256, vel,
                                   acc, grav)
    end = traj_mod.position(tr, tr.tf)
    epx, epy = rappids.project(params.cam, end)
    x0s = epx[:n_seeds].astype(jnp.int32)
    y0s = epy[:n_seeds].astype(jnp.int32)
    depths = end[:n_seeds, 2]

    CHUNK = 50

    def timed(skip, label):
        @jax.jit
        def f(x, y, d):
            def body(c, _):
                x, y, d = c
                ok, maxd, edges = pallas_inflate.inflate_pyramids(
                    params, depth, x, y, d, interpret=not on_tpu,
                    _skip_passes=frozenset(skip))
                return (x + ok.astype(jnp.int32) * 0, y, d), (
                    ok.sum().astype(jnp.int32) + maxd.sum() + edges.sum())
            _, outs = jax.lax.scan(body, (x, y, d), None, length=CHUNK)
            return outs
        t = _util.pipelined_time(f, x0s, y0s, depths) / CHUNK
        us = t * 1e6 / n_seeds
        print(f"{label:24s} {us:7.2f} us/seed")
        return us

    a = timed({"expand", "B", "C", "D"}, "A only")
    ae = timed({"B", "C", "D"}, "A+expand")
    aeb = timed({"C", "D"}, "A+expand+B")
    aebc = timed({"D"}, "A+expand+B+C")
    full = timed({}, "full")
    print(f"\n  A        {a:7.2f}")
    print(f"  expand   {ae - a:7.2f}")
    print(f"  B        {aeb - ae:7.2f}")
    print(f"  C        {aebc - aeb:7.2f}")
    print(f"  D        {full - aebc:7.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
