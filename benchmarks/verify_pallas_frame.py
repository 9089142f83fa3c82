"""Hardware parity artifact for the fused Pallas tick kernel.

tests/test_pallas_frame.py proves the kernel's *program* (the laundered
jaxpr) equals the scanned jnp loop, but evaluates it outside pallas_call
(interpret-mode inlining explodes the CPU compile). This script executes
the REAL `pl.pallas_call` on the TPU — single-vehicle `frame_ticks` and
the batched fleet `frame_ticks_batched` — against the jnp reference at
cold and warm (40-frame flight) states, and prints one JSON line per
check so the results can be pinned as a checked-in artifact
(VERIFY_r04.json) instead of prose. Round-3 verdict weak #3.

Pass criteria: every discrete leaf (FSM codes, panic, counters, PRNG
key) bit-equal — EXCEPT the u16-quantized radio wire fields, where a
sub-ulp float difference in the commanded thrust/rates can flip one
quantization code (allowed: max abs delta 1 code, counted separately);
float leaves within the cross-program FMA-contraction band, scaled to
each leaf's dynamic range (rtol 2e-5 OR atol 2.5e-4 * max|ref| — the
attitude-control chain amplifies association differences on the warm
tracking vehicle to ~1e-4 rad/s out of ~3 rad/s over a 16-tick block;
the kernel's PROGRAM is bit-exact vs the scanned jnp loop on CPU,
tests/test_pallas_frame.py, so any delta here is TPU codegen
contraction, not logic).

    python -m benchmarks.verify_pallas_frame [--cpu]
"""

import json
import sys

from benchmarks import _util


def _compare(ref, out, tag):
    import jax
    import numpy as np

    la, ta = jax.tree_util.tree_flatten(ref)
    lb, tb = jax.tree_util.tree_flatten(out)
    paths = jax.tree_util.tree_flatten_with_path(ref)[0]
    assert ta == tb
    n_bit = 0
    worst = 0.0
    quant_flips = 0
    ok = True
    bad = []
    for i, (x, y) in enumerate(zip(la, lb)):
        x, y = np.asarray(x), np.asarray(y)
        if np.array_equal(x, y):
            n_bit += 1
            continue
        path = jax.tree_util.keystr(paths[i][0])
        if np.issubdtype(x.dtype, np.floating):
            err = float(np.max(np.abs(x - y) / (np.abs(x) + 1e-5)))
            worst = max(worst, err)
            atol = 2.5e-4 * max(float(np.max(np.abs(x))), 1e-3)
            if not np.allclose(x, y, rtol=2e-5, atol=atol):
                ok = False
                bad.append(i)
        elif "ring.fields" in path:
            # u16-quantized wire codes: a sub-ulp cmd difference flips
            # at most one code near a quantization boundary
            d = np.abs(x.astype(np.int64) - y.astype(np.int64))
            quant_flips += int((d > 0).sum())
            if int(d.max()) > 1:
                ok = False
                bad.append(i)
        else:
            ok = False
            bad.append(i)
    line = {
        "check": tag, "pass": bool(ok),
        "bit_equal_leaves": n_bit, "total_leaves": len(la),
        "worst_float_rel": worst, "quant_code_flips": quant_flips,
    }
    if bad:
        line["bad_leaves"] = bad
    print(json.dumps(line))
    return ok


def main(argv):
    argv = _util.force_cpu_if_flagged(argv)

    import jax
    import jax.numpy as jnp

    from agrifly_tpu.sim import orchard_env, pallas_frame

    on_tpu = jax.devices()[0].platform != "cpu"
    interpret = not on_tpu
    params = orchard_env.make_params(
        width=160, height=120, n_candidates=64, pyramid_capacity=8,
        planner_rounds=1, use_pallas=False, start_flight_time=0.5,
        noise_scale=1.0)

    cold = orchard_env.init_state(params, jax.random.PRNGKey(0))
    fly = jax.jit(lambda s: orchard_env.fly(params, s, 40)[0])
    warm = jax.block_until_ready(fly(cold))

    ok = True
    for tag, state in (("single_cold", cold), ("single_warm", warm)):
        noise = jax.random.normal(
            jax.random.PRNGKey(7), (params.steps_per_frame, 2, 3),
            jnp.float32)
        ref = jax.jit(
            lambda s: orchard_env.frame_ticks_jnp(params, s, noise))(state)
        out = jax.jit(
            lambda s: pallas_frame.frame_ticks(
                params, s, noise, interpret=interpret))(state)
        ok &= _compare(ref, out, f"pallas_frame_{tag}")

    # fleet kernel at fleet shapes: B=16, vehicle 0 warmed so discrete
    # branches diverge across the batch
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    bstate = jax.vmap(lambda k: orchard_env.init_state(params, k))(keys)
    bstate = jax.tree_util.tree_map(
        lambda bl, wl: bl.at[0].set(wl), bstate, warm)
    noise = jax.random.normal(
        jax.random.PRNGKey(5), (B, params.steps_per_frame, 2, 3),
        jnp.float32)
    ref = jax.jit(jax.vmap(
        lambda s, n: orchard_env.frame_ticks_jnp(params, s, n)))(
            bstate, noise)
    out = jax.jit(
        lambda s: pallas_frame.frame_ticks_batched(
            params, s, noise, interpret=interpret))(bstate)
    ok &= _compare(ref, out, f"pallas_frame_fleet_b{B}")

    print(json.dumps({"check": "all", "pass": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
