"""Experiments on the 16-tick scan cost (the frame's dominant phase)."""
import time

import jax
import jax.numpy as jnp

from agrifly_tpu.sim import orchard_env

N_FRAMES = 31
REPS = 5


def timeit(fn, arg):
    jax.block_until_ready(fn(arg))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        best = min(best, time.perf_counter() - t0)
    return best / N_FRAMES


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    params = orchard_env.make_params(use_pallas=on_tpu)
    state = orchard_env.init_state(params, jax.random.PRNGKey(0))
    warm = jax.jit(lambda s: orchard_env.fly(params, s, 160)[0])
    state = jax.block_until_ready(warm(state))

    for unroll in (1, 2, 4, 8, 16):
        @jax.jit
        def ticks(s, unroll=unroll):
            def body(c, _):
                return orchard_env._sim_tick(params, c), None
            return jax.lax.scan(body, s, None, length=16 * N_FRAMES,
                                unroll=unroll)[0]
        t0 = time.perf_counter()
        t = timeit(ticks, state)
        print(f"unroll={unroll:2d}: {t*1e3:8.3f} ms/frame "
              f"(compile+run1 {time.perf_counter()-t0:.1f}s)")


if __name__ == "__main__":
    main()
