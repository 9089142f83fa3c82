"""TILE_H sweep + fixed-overhead probe for the inflation kernel.

The region-bounded passes (planner/pallas_inflate.py) loop only over the
TILE_H-row tiles each mask can hit, so the tile height trades wasted rows
(a 60-row pyramid touches 2-3 48-row tiles = up to 2.4x the element work)
against per-iteration loop overhead. This sweeps tile_h over the divisors
of H and also times an all-blocked seed batch (pass A + early-out only),
which bounds the fixed per-grid-step cost the region bounding can't touch.

    python -m benchmarks._sweep_inflate_tile [--cpu] [--seeds 32]
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
        depth = pallas_raycast.render_depth_batch(cfg, scene, pos[None], cam_att[None])[0]
    else:
        depth = raycast.render_depth(cfg, scene, pos, cam_att)
    depth = jax.block_until_ready(depth)

    # realistic seeds: gated candidate endpoints, like build_pyramid_set's
    vel = jnp.array([0.0, 0.0, 1.5], jnp.float32)
    acc = jnp.zeros(3, jnp.float32)
    grav = jnp.array([0.0, 9.81, 0.0], jnp.float32)
    tr = rappids.sample_candidates(params, jax.random.PRNGKey(1), 256, vel, acc, grav)
    end = traj_mod.position(tr, tr.tf)
    epx, epy = rappids.project(params.cam, end)
    x0s = epx[:n_seeds].astype(jnp.int32)
    y0s = epy[:n_seeds].astype(jnp.int32)
    depths = end[:n_seeds, 2]

    CHUNK = 50

    def timed(min_depths, tile_h, label, tile_w=None):
        @jax.jit
        def f(x, y, d):
            def body(c, _):
                x, y, d = c
                ok, maxd, edges = pallas_inflate.inflate_pyramids(
                    params, depth, x, y, d, tile_h=tile_h, tile_w=tile_w,
                    interpret=not on_tpu)
                # fold outputs back in so scan iterations are not DCE'd
                return (x + ok.astype(jnp.int32) * 0, y, d), (
                    ok.sum().astype(jnp.int32) + maxd.sum() + edges.sum())
            _, outs = jax.lax.scan(body, (x, y, d), None, length=CHUNK)
            return outs
        t = _util.pipelined_time(f, x0s, y0s, min_depths) / CHUNK
        us_seed = t * 1e6 / n_seeds
        print(f"{label:28s} {us_seed:7.2f} us/seed   ({t*1e3:.3f} ms/call, "
              f"{n_seeds} seeds)")
        return us_seed

    H, W = 480, 640
    ths = [th for th in (8, 16, 24, 32, 40, 48, 96) if H % th == 0]
    # tile_w=640 (one column tile) reproduces the row-tiled layout; 128 is
    # one vreg of lanes (the 2-D region-bounding default).
    tws = [tw for tw in (64, 128, 320, 640) if W % tw == 0]
    for tw in tws:
        for th in ths:
            timed(depths, th, f"tile {th}x{tw} (realistic)", tile_w=tw)
    # all-blocked probe: min depth past the far plane forces pass-A failure
    timed(jnp.full((n_seeds,), 20.0, jnp.float32), None,
          "blocked early-out (default)")


if __name__ == "__main__":
    main(sys.argv[1:])
