"""Split the per-tick cost: physics+onboard vs offboard glue; count kernels."""
import re
import time

import jax
import jax.numpy as jnp

from agrifly_tpu.sim import env as env_mod
from agrifly_tpu.sim import orchard_env

N = 31 * 16
REPS = 5


def timeit(fn, arg):
    jax.block_until_ready(fn(arg))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        best = min(best, time.perf_counter() - t0)
    return best / N


def kernel_count(jfn, arg):
    txt = jfn.lower(arg).compile().as_text()
    # kernel-ish ops in the entry/while-body: fusions + custom calls
    return (len(re.findall(r"= .*fusion\(", txt)),
            len(re.findall(r"custom-call", txt)), len(txt.splitlines()))


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    params = orchard_env.make_params(use_pallas=on_tpu)
    state = orchard_env.init_state(params, jax.random.PRNGKey(0))
    warm = jax.jit(lambda s: orchard_env.fly(params, s, 160)[0])
    state = jax.block_until_ready(warm(state))
    p = params.base
    z3 = jnp.zeros(3, jnp.float32)

    @jax.jit
    def full(s):
        def body(c, _):
            return orchard_env._sim_tick(params, c), None
        return jax.lax.scan(body, s, None, length=N)[0]

    @jax.jit
    def physics_only(s):
        # physics_tick + minimal carry rebuild (no offboard controllers)
        def body(c, _):
            base = c.base
            half = env_mod.physics_tick(base, p, z3, z3, use_estimator=True)
            new_base = env_mod.EnvState(
                plant=half["plant"], logic=half["logic"], ring=half["ring"],
                offboard_acc_us=base.offboard_acc_us, step=base.step + 1,
                key=half["key"], last_cmd_thrust=base.last_cmd_thrust,
                last_cmd_angvel=base.last_cmd_angvel, mocap=half["mocap"],
                mocap_acc_us=half["mocap_acc_us"], gpsimu=half["gpsimu"],
                gps_acc_us=half["gps_acc_us"], uwb=half["uwb"],
            )
            return c._replace(base=new_base), None
        return jax.lax.scan(body, s, None, length=N)[0]

    t_full = timeit(full, state)
    t_phys = timeit(physics_only, state)
    print(f"full tick:     {t_full*1e6:8.1f} us")
    print(f"physics only:  {t_phys*1e6:8.1f} us")
    print(f"offboard glue: {(t_full-t_phys)*1e6:8.1f} us")
    print("full kernels (fusions, custom-calls, hlo lines):",
          kernel_count(full, state))
    print("phys kernels:", kernel_count(physics_only, state))


if __name__ == "__main__":
    main()
