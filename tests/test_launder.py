"""ops/launder: Mosaic-safe jaxpr evaluation is value-identical.

Unit tests pin each rewrite (bool carriers, minor-dim concat assembly,
scalar-pred select, scan/while/cond recursion) on synthetic programs;
the fleet tick-block parity lives in tests/test_pallas_frame.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from agrifly_tpu.ops import launder


def _run_laundered(fn, *args):
    closed = jax.make_jaxpr(fn)(*args)
    consts = [launder._np_carrier(c) for c in closed.consts]
    carriers = [launder.to_carrier(a) for a in args]
    outs = launder.eval_jaxpr(closed.jaxpr, consts, *carriers)
    dtypes = [v.aval.dtype for v in closed.jaxpr.outvars]
    return [launder.from_carrier(o, d) for o, d in zip(outs, dtypes)]


def _check(fn, *args):
    ref = fn(*args)
    if not isinstance(ref, (list, tuple)):
        ref = [ref]
    got = _run_laundered(fn, *args)
    for i, (r, g) in enumerate(zip(ref, got, strict=True)):
        r, g = np.asarray(r), np.asarray(g)
        assert r.dtype == g.dtype, f"out {i}: {r.dtype} != {g.dtype}"
        np.testing.assert_array_equal(r, g, err_msg=f"out {i}")


def test_bool_ops_and_reductions():
    x = jnp.array([[1.0, -2.0, 0.0], [3.0, 0.5, -1.0]])

    def fn(x):
        a = x > 0
        b = x < 2
        c = a & b
        d = a | ~b
        e = jnp.any(c, axis=1)
        f = jnp.all(d, axis=0)
        g = jnp.where(c, x, -x)
        h = c.astype(jnp.float32) + d.astype(jnp.int32)
        i = (x.astype(jnp.int32)).astype(jnp.bool_)
        return c, d, e, f, g, h, i

    _check(fn, x)


def test_bool_reshape_broadcast_concat():
    """The vmap-inserted i1 shape ops that Mosaic can't lower."""
    m = jnp.array([True, False, True])

    def fn(m):
        a = m[:, None] & m[None, :]
        b = jnp.broadcast_to(m, (4, 3))
        c = jnp.concatenate([m[:, None], ~m[:, None]], axis=1)
        d = jnp.stack([m, ~m], axis=-1)
        return a, b, c, d

    _check(fn, m)


def test_minor_concat_assembly_matches():
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (8, 1))
    b = jax.random.normal(jax.random.fold_in(k, 1), (8, 3))
    c = jax.random.normal(jax.random.fold_in(k, 2), (8, 1))

    def fn(a, b, c):
        return (jnp.concatenate([a, b, c], axis=1),
                jnp.concatenate([b, a], axis=1),
                jnp.stack([a[:, 0], c[:, 0]], axis=-1))

    _check(fn, a, b, c)


def test_scalar_pred_select_broadcast():
    def fn(x, t):
        return jnp.where(t > 1.0, x, 2 * x)  # scalar pred, vector cases

    _check(fn, jnp.arange(8.0), jnp.float32(3.0))


def test_scan_while_cond_recursion():
    def fn(x):
        def body(c, xi):
            flag = c[0] > xi  # bool carried through the scan
            return (jnp.where(flag, c[0] - xi, c[0] + xi), flag), flag

        (tot, _), flags = lax.scan(body, (x[0], x[0] > 0), x)

        w = lax.while_loop(lambda v: v[0] < 10.0,
                           lambda v: (v[0] + 1.0, v[1] & True),
                           (tot, tot > 0))
        br = lax.cond(w[0] > 11.0, lambda y: y * 2.0, lambda y: y - 1.0, tot)
        return tot, flags, w[0], w[1], br

    _check(fn, jnp.array([1.0, 4.0, 2.0, 0.5]))


def test_fori_loop_bool_carry():
    def fn(x):
        def body(i, c):
            v, ok = c
            return v + x[i % 4], ok & (v < 100.0)

        return lax.fori_loop(0, 7, body, (x[0], x[0] > 0))

    _check(fn, jnp.array([1.0, -2.0, 3.0, 0.25]))
