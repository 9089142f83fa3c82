"""Pallas inflation kernel vs the jnp reference path (interpret mode).

The kernel (planner/pallas_inflate.py) must be bit-identical to
rappids.inflate_pyramid for every seed it marks valid: same validity flags,
same integer pixel bounds, same expanded-rect min depth. Bounds of invalid
seeds are unspecified (both paths mask them via PyramidSet.valid).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agrifly_tpu.planner import pallas_inflate, rappids


def make_scene(W, H, n_obstacles, seed):
    rng = np.random.default_rng(seed)
    img = np.full((H, W), 230, np.int32)
    for _ in range(n_obstacles):
        x = rng.integers(5, W - 5)
        y = rng.integers(5, H - 5)
        w = rng.integers(3, max(4, W // 8))
        h = rng.integers(5, max(6, H // 2))
        d = rng.integers(25, 140)
        img[max(0, y - h // 2):y + h // 2, max(0, x - w // 2):x + w // 2] = d
    return jnp.asarray(img)


@pytest.mark.parametrize("W,H", [(160, 120), (80, 60)])
@pytest.mark.parametrize("shrink_extra", [0, 1])
def test_kernel_matches_jnp_inflation(W, H, shrink_extra):
    cam = rappids.make_camera(W, H, focal=W / 2.0)
    params = rappids.make_params(cam, 0.116, 0.174)
    img = make_scene(W, H, 8, seed=3)

    P = 24
    x0 = jax.random.randint(jax.random.PRNGKey(1), (P,), 2, W - 2)
    y0 = jax.random.randint(jax.random.PRNGKey(2), (P,), 2, H - 2)
    md = jax.random.uniform(jax.random.PRNGKey(3), (P,), jnp.float32, 1.5, 3.0)

    ok_j, depth_j, bounds_j, _ = jax.vmap(
        lambda x, y, d: rappids.inflate_pyramid(params, img, x, y, d, shrink_extra)
    )(x0, y0, md)
    ok_p, maxd_p, edges_p = pallas_inflate.inflate_pyramids(
        params, img, x0, y0, md, shrink_extra, interpret=True
    )

    okj = np.asarray(ok_j)
    np.testing.assert_array_equal(okj, np.asarray(ok_p))
    assert okj.sum() >= 3  # scene sanity: some valid pyramids exist
    np.testing.assert_array_equal(
        np.asarray(bounds_j)[okj], np.asarray(edges_p, np.float32)[okj]
    )
    base_p = np.asarray(maxd_p, np.float32) * float(cam.depth_scale) - float(params.plan_radius)
    np.testing.assert_allclose(np.asarray(depth_j)[okj], base_p[okj], rtol=0, atol=0)


def test_build_pyramid_set_pallas_parity():
    """build_pyramid_set(use_pallas=...) produces the same PyramidSet."""
    W, H = 160, 120
    cam = rappids.make_camera(W, H, focal=W / 2.0)
    params = rappids.make_params(cam, 0.116, 0.174)
    img = make_scene(W, H, 6, seed=7)
    P = 16
    x0 = jax.random.uniform(jax.random.PRNGKey(4), (P,), jnp.float32, 5.0, W - 5.0)
    y0 = jax.random.uniform(jax.random.PRNGKey(5), (P,), jnp.float32, 5.0, H - 5.0)
    md = jax.random.uniform(jax.random.PRNGKey(6), (P,), jnp.float32, 1.5, 3.0)
    valid = jnp.ones((P,), bool)

    import agrifly_tpu.planner.pallas_inflate as pi
    import functools
    orig = pi.inflate_pyramids
    pi.inflate_pyramids = functools.partial(orig, interpret=True)
    try:
        for k in (1, 2):
            a = rappids.build_pyramid_set(params, img, x0, y0, md, valid, P,
                                          downsample=k, use_pallas=False)
            b = rappids.build_pyramid_set(params, img, x0, y0, md, valid, P,
                                          downsample=k, use_pallas=True)
            np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
            v = np.asarray(a.valid)
            np.testing.assert_array_equal(np.asarray(a.bounds)[v], np.asarray(b.bounds)[v])
            np.testing.assert_allclose(np.asarray(a.depth)[v], np.asarray(b.depth)[v])
            np.testing.assert_allclose(np.asarray(a.normals)[v], np.asarray(b.normals)[v])
    finally:
        pi.inflate_pyramids = orig


@pytest.mark.parametrize("P,S", [(24, 2), (24, 4), (13, 4), (5, 2)])
def test_grouped_kernel_parity(P, S):
    """S co-resident seeds per grid program (_kernel_grouped) are
    bit-identical to the per-seed kernel, including ragged P (padding
    seeds are ok-cleared copies of row 0 and must never un-skip a
    tile or leak into the sliced outputs)."""
    W, H = 160, 120
    cam = rappids.make_camera(W, H, focal=W / 2.0)
    params = rappids.make_params(cam, 0.116, 0.174)
    img = make_scene(W, H, 8, seed=3)
    x0 = jax.random.randint(jax.random.PRNGKey(P), (P,), 2, W - 2)
    y0 = jax.random.randint(jax.random.PRNGKey(P + 1), (P,), 2, H - 2)
    md = jax.random.uniform(jax.random.PRNGKey(P + 2), (P,), jnp.float32,
                            1.5, 3.0)
    for shrink_extra in (0, 1):
        ok1, maxd1, e1 = pallas_inflate.inflate_pyramids(
            params, img, x0, y0, md, shrink_extra, interpret=True)
        ok2, maxd2, e2 = pallas_inflate.inflate_pyramids(
            params, img, x0, y0, md, shrink_extra, interpret=True,
            seeds_per_program=S)
        o = np.asarray(ok1)
        np.testing.assert_array_equal(o, np.asarray(ok2))
        np.testing.assert_array_equal(np.asarray(maxd1)[o],
                                      np.asarray(maxd2)[o])
        np.testing.assert_array_equal(np.asarray(e1)[o], np.asarray(e2)[o])
    assert o.sum() >= 1


@pytest.mark.parametrize("tile_h,tile_w", [(8, None), (24, 16), (40, 40),
                                           (120, 32), (24, 160)])
def test_tile_shape_invariance(tile_h, tile_w):
    """Outputs are bit-identical for any legal tile shape (the region
    bounds change which tiles are visited, never what they contribute)."""
    W, H = 160, 120
    cam = rappids.make_camera(W, H, focal=W / 2.0)
    params = rappids.make_params(cam, 0.116, 0.174)
    img = make_scene(W, H, 8, seed=11)
    P = 16
    x0 = jax.random.randint(jax.random.PRNGKey(7), (P,), 2, W - 2)
    y0 = jax.random.randint(jax.random.PRNGKey(8), (P,), 2, H - 2)
    md = jax.random.uniform(jax.random.PRNGKey(9), (P,), jnp.float32, 1.5, 3.0)

    ok_d, maxd_d, edges_d = pallas_inflate.inflate_pyramids(
        params, img, x0, y0, md, interpret=True)
    ok_t, maxd_t, edges_t = pallas_inflate.inflate_pyramids(
        params, img, x0, y0, md, interpret=True, tile_h=tile_h, tile_w=tile_w)
    okd = np.asarray(ok_d)
    assert okd.sum() >= 3
    np.testing.assert_array_equal(okd, np.asarray(ok_t))
    np.testing.assert_array_equal(np.asarray(maxd_d)[okd], np.asarray(maxd_t)[okd])
    np.testing.assert_array_equal(np.asarray(edges_d)[okd], np.asarray(edges_t)[okd])
