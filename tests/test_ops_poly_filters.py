import numpy as np
import jax.numpy as jnp

from agrifly_tpu.ops import filters, poly


def test_polyval_matches_numpy():
    rng = np.random.default_rng(0)
    coeffs = rng.standard_normal((6, 3))
    for t in [0.0, 0.5, 2.0, -1.3]:
        got = poly.polyval(jnp.array(coeffs), t)
        expect = np.stack([np.polyval(coeffs[:, i], t) for i in range(3)])
        assert np.allclose(got, expect, atol=1e-9)


def test_deriv_coeffs():
    rng = np.random.default_rng(1)
    coeffs = rng.standard_normal((6, 3))
    d = poly.deriv_coeffs(jnp.array(coeffs))
    for i in range(3):
        expect = np.polyder(coeffs[:, i])
        assert np.allclose(np.asarray(d)[:, i], expect)


def test_velocity_acceleration_consistency():
    rng = np.random.default_rng(2)
    coeffs = jnp.array(rng.standard_normal((4, 6, 3)))
    t = 0.7
    eps = 1e-6
    v = poly.velocity(coeffs, t)
    num_v = (poly.position(coeffs, t + eps) - poly.position(coeffs, t - eps)) / (2 * eps)
    assert np.allclose(v, num_v, atol=1e-5)
    a = poly.acceleration(coeffs, t)
    num_a = (poly.velocity(coeffs, t + eps) - poly.velocity(coeffs, t - eps)) / (2 * eps)
    assert np.allclose(a, num_a, atol=1e-4)


def _scan_lp1(st, xs):
    import jax

    return jax.lax.scan(filters.lp1_apply, st, xs)


def test_lp1_matches_scalar_recursion():
    dt, wc = 0.002, 1.0
    st = filters.lp1_init(dt, wc, 0.0)
    c = np.exp(-dt * wc)
    rng = np.random.default_rng(3)
    xs = rng.standard_normal(100).astype(np.float32)
    _, ys = _scan_lp1(st, jnp.array(xs))
    y_ref = 0.0
    for x, y in zip(xs, np.asarray(ys)):
        y_ref = c * y_ref + (1 - c) * x
        assert abs(float(y) - y_ref) < 1e-5


def _scan_lp2(coeffs, st, xs):
    import jax

    return jax.lax.scan(lambda s, x: filters.lp2_apply(coeffs, s, x), st, xs)


def test_lp2_dc_gain_is_one():
    coeffs = filters.lp2_coeffs(0.002, 100.0)
    st = filters.lp2_init(0.0)
    _, ys = _scan_lp2(coeffs, st, jnp.ones(5000, dtype=jnp.float32))
    assert abs(float(ys[-1]) - 1.0) < 1e-3


def test_lp2_attenuates_high_freq():
    dt = 0.002
    coeffs = filters.lp2_coeffs(dt, 50.0)
    st = filters.lp2_init(0.0)
    # input at 2000 rad/s, far above 50 rad/s cutoff
    k = np.arange(4000)
    xs = np.sin(2000.0 * k * dt).astype(np.float32)
    _, ys = _scan_lp2(coeffs, st, jnp.array(xs))
    assert np.max(np.abs(np.asarray(ys)[2000:])) < 0.1


def test_lp2_vector_state():
    coeffs = filters.lp2_coeffs(0.002, 100.0)
    st = filters.lp2_init(jnp.zeros(3))
    st, y = filters.lp2_apply(coeffs, st, jnp.array([1.0, 2.0, 3.0]))
    assert y.shape == (3,)
