import numpy as np
import jax.numpy as jnp

from agrifly_tpu.ops import rootfind


def np_real_roots(coeffs, tol=1e-6):
    r = np.roots(coeffs)
    return np.sort(r[np.abs(r.imag) < tol].real)


def _check_cubic(a, b, c, atol=1e-4):
    roots, valid = rootfind.solve_cubic(jnp.float64(a), jnp.float64(b), jnp.float64(c))
    got = np.sort(np.asarray(roots)[np.asarray(valid)])
    expect = np_real_roots([1.0, a, b, c])
    # the closed-form solver may return a double root once; compare as sets
    for e in expect:
        assert np.min(np.abs(got - e)) < atol, (a, b, c, got, expect)
    for g in got:
        assert np.min(np.abs(expect - g)) < atol, (a, b, c, got, expect)


def _check_quartic(a, b, c, d, atol=1e-4):
    roots, valid = rootfind.solve_quartic(
        jnp.float64(a), jnp.float64(b), jnp.float64(c), jnp.float64(d)
    )
    got = np.asarray(roots)[np.asarray(valid)]
    expect = np_real_roots([1.0, a, b, c, d])
    for e in expect:
        assert np.min(np.abs(got - e)) < atol, (a, b, c, d, got, expect)
    # every reported root must actually be a root
    for g in got:
        val = ((g + a) * g + b) * g * g + c * g + d
        # scale-aware residual check
        scale = max(1.0, abs(g)) ** 4
        assert abs(val) / scale < 1e-3, (a, b, c, d, g, val)


def test_cubic_three_real():
    # (x-1)(x-2)(x-3) = x^3 -6x^2 +11x -6
    _check_cubic(-6.0, 11.0, -6.0)


def test_cubic_one_real():
    # (x-1)(x^2+1) = x^3 - x^2 + x - 1
    _check_cubic(-1.0, 1.0, -1.0)


def test_cubic_double_root():
    # (x-2)^2 (x+1) = x^3 -3x^2 +0x +4
    _check_cubic(-3.0, 0.0, 4.0)


def test_cubic_random():
    rng = np.random.default_rng(0)
    abc = rng.uniform(-5, 5, (200, 3))
    roots, valid = rootfind.solve_cubic(
        jnp.array(abc[:, 0]), jnp.array(abc[:, 1]), jnp.array(abc[:, 2])
    )
    roots, valid = np.asarray(roots), np.asarray(valid)
    for i, (a, b, c) in enumerate(abc):
        got = np.sort(roots[i][valid[i]])
        expect = np_real_roots([1.0, a, b, c])
        for e in expect:
            assert np.min(np.abs(got - e)) < 1e-4, (a, b, c, got, expect)
        for g in got:
            assert np.min(np.abs(expect - g)) < 1e-4, (a, b, c, got, expect)


def test_quartic_four_real():
    # (x-1)(x-2)(x-3)(x-4)
    _check_quartic(-10.0, 35.0, -50.0, 24.0)


def test_quartic_no_real():
    # (x^2+1)(x^2+4)
    roots, valid = rootfind.solve_quartic(0.0, 5.0, 0.0, 4.0)
    assert not np.any(np.asarray(valid))


def test_quartic_two_real():
    # (x^2+1)(x-1)(x+2) = x^4 + x^3 - x^2 + x - 2
    _check_quartic(1.0, -1.0, 1.0, -2.0)


def test_quartic_random():
    rng = np.random.default_rng(1)
    abcd = rng.uniform(-4, 4, (200, 4))
    roots, valid = rootfind.solve_quartic(*(jnp.array(abcd[:, i]) for i in range(4)))
    roots, valid = np.asarray(roots), np.asarray(valid)
    for i, (a, b, c, d) in enumerate(abcd):
        got = roots[i][valid[i]]
        expect = np_real_roots([1.0, a, b, c, d])
        for e in expect:
            assert np.min(np.abs(got - e)) < 1e-4, (a, b, c, d, got, expect)
        for g in got:
            val = ((g + a) * g + b) * g * g + c * g + d
            scale = max(1.0, abs(g)) ** 4
            assert abs(val) / scale < 1e-3, (a, b, c, d, g, val)


def test_quartic_batched():
    a = jnp.array([0.0, 1.0])
    b = jnp.array([5.0, -1.0])
    c = jnp.array([0.0, 1.0])
    d = jnp.array([4.0, -2.0])
    roots, valid = rootfind.solve_quartic(a, b, c, d)
    assert roots.shape == (2, 4)
    assert not np.any(np.asarray(valid)[0])
    assert np.sum(np.asarray(valid)[1]) == 2


def test_quadratic():
    roots, valid = rootfind.solve_quadratic(1.0, -3.0, 2.0)
    got = np.sort(np.asarray(roots)[np.asarray(valid)])
    assert np.allclose(got, [1.0, 2.0], atol=1e-6)
    # linear fallback
    roots, valid = rootfind.solve_quadratic(0.0, 2.0, -4.0)
    got = np.asarray(roots)[np.asarray(valid)]
    assert np.allclose(got, [2.0])
    # no real roots
    _, valid = rootfind.solve_quadratic(1.0, 0.0, 1.0)
    assert not np.any(np.asarray(valid))


def test_no_nans_anywhere():
    rng = np.random.default_rng(2)
    a, b, c, d = [jnp.array(rng.uniform(-10, 10, 500)) for _ in range(4)]
    r3, _ = rootfind.solve_cubic(a, b, c)
    r4, _ = rootfind.solve_quartic(a, b, c, d)
    assert np.all(np.isfinite(np.asarray(r3)))
    assert np.all(np.isfinite(np.asarray(r4)))
