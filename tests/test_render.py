"""On-device depth raycaster: geometric correctness from known poses."""

import numpy as np
import jax
import jax.numpy as jnp

from agrifly_tpu.ops import rotation as rot
from agrifly_tpu.render import orchard, raycast

CFG = raycast.make_config(width=160, height=120, far=10.0, dda_steps=8)
SCALE = 10.0 / 256.0


def empty_scene():
    # presence 0: no trees, just the ground plane
    return orchard.make_params(presence=0.0)


def test_camera_convention_looks_forward():
    # camera mounted forward: at 2 m height looking at flat ground, the top
    # half of the image is sky (255 = far), the bottom half hits the ground
    scene = empty_scene()
    pos = jnp.array([0.0, 0.0, 2.0], jnp.float32)
    att = rot.identity()  # body level, facing +x
    img = np.asarray(raycast.render_depth_body(CFG, scene, pos, att))
    assert img.shape == (120, 160)
    assert np.all(img[:50, :] == 255)  # sky
    # ground enters the far plane where h*f/k < far: k > 2*80/10 = 16 px
    assert np.all(img[80:, :] < 255)  # ground visible


def test_ground_depth_values():
    # pixel (cy + k, cx): ray declination angle theta has tan(theta) = k/f;
    # planar depth to ground from height h is h * f / k
    scene = empty_scene()
    h = 2.0
    pos = jnp.array([0.0, 0.0, h], jnp.float32)
    img = np.asarray(raycast.render_depth_body(CFG, scene, pos, rot.identity()))
    f = CFG.focal
    for k in (30, 45, 59):
        expected = h * f / k
        if expected < 10.0:
            got = img[60 + k, 80] * SCALE
            assert abs(got - expected) < 0.15, (k, got, expected)


def test_single_tree_visible():
    # a dense orchard straight ahead: something closer than far plane in view
    scene = orchard.make_params(presence=1.0, clear_radius=2.0, seed=3)
    pos = jnp.array([0.0, 0.0, 1.5], jnp.float32)
    img = np.asarray(raycast.render_depth_body(CFG, scene, pos, rot.identity()))
    assert img.min() < 200  # trees within ~8 m
    assert (img < 255).mean() > 0.2


def test_yaw_changes_view():
    scene = orchard.make_params(presence=1.0, clear_radius=2.0, seed=5)
    pos = jnp.array([0.0, 0.0, 1.5], jnp.float32)
    img0 = np.asarray(raycast.render_depth_body(CFG, scene, pos, rot.identity()))
    att_yaw = rot.from_euler_ypr(jnp.float32(np.pi / 2), jnp.float32(0), jnp.float32(0))
    img1 = np.asarray(raycast.render_depth_body(CFG, scene, pos, att_yaw))
    assert not np.array_equal(img0, img1)


def test_batched_render():
    scene = orchard.make_params(seed=7)
    poses = jnp.array([[0.0, 0.0, 1.5], [1.0, 0.5, 2.0], [2.0, -1.0, 1.0]], jnp.float32)
    atts = jnp.tile(rot.identity(), (3, 1))
    imgs = jax.vmap(lambda p, a: raycast.render_depth_body(CFG, scene, p, a))(poses, atts)
    assert imgs.shape == (3, 120, 160)


def test_deterministic_scene():
    scene = orchard.make_params(seed=11)
    pos = jnp.array([0.0, 0.0, 1.5], jnp.float32)
    a = np.asarray(raycast.render_depth_body(CFG, scene, pos, rot.identity()))
    b = np.asarray(raycast.render_depth_body(CFG, scene, pos, rot.identity()))
    assert np.array_equal(a, b)
    scene2 = orchard.make_params(seed=12)
    c = np.asarray(raycast.render_depth_body(CFG, scene2, pos, rot.identity()))
    assert not np.array_equal(a, c)


def test_rgb_render():
    scene = orchard.make_params(presence=1.0, clear_radius=2.0, seed=3)
    pos = jnp.array([0.0, 0.0, 1.5], jnp.float32)
    img = np.asarray(raycast.render_rgb_body(CFG, scene, pos, rot.identity()))
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    # sky at top (bluish: B > R), something non-sky below
    assert img[5, 80, 2] > img[5, 80, 0]
    # pure-sky pixels in the RGB image must be beyond the far plane in depth
    depth = np.asarray(raycast.render_depth_body(CFG, scene, pos, rot.identity()))
    sky_color = np.asarray(raycast._COLORS[0] * 255).astype(np.uint8)
    sky_rgb = np.all(img == sky_color, axis=-1)
    assert sky_rgb.any()
    assert np.all(depth[sky_rgb] == 255)
    # near-field content is visibly not sky-colored
    near = depth < 100
    assert near.any()
    ys, xs = np.where(near)
    diff = np.abs(img[ys, xs].astype(int) - sky_color.astype(int)).max()
    assert diff > 20
