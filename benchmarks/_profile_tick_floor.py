"""Floor analysis: per-tick cost of each stage subset on the current backend."""
import time

import jax
import jax.numpy as jnp

from agrifly_tpu.models import logic as onboard
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


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    params = orchard_env.make_params(use_pallas=on_tpu)
    state = orchard_env.init_state(params, jax.random.PRNGKey(0))
    warm = jax.jit(lambda s: orchard_env.fly(params, s, 160)[0])
    state = jax.block_until_ready(warm(state))
    p = params.base
    z3 = jnp.zeros(3, jnp.float32)

    def scan_of(body):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (body(c), None), s, None, length=N)[0]
        return run

    def phase_a_only(c):
        base = c.base
        a = env_mod.physics_phase_a(base, p, z3, z3)
        return c._replace(base=base._replace(
            plant=a["plant"], key=a["key"], ring=a["ring"], step=base.step + 1))

    def phase_a_logic(c):
        base = c.base
        a = env_mod.physics_phase_a(base, p, z3, z3)
        batt_v = p.logic.batt_critical * 1.2
        inputs = onboard.null_inputs()._replace(
            gyro=a["gyro_meas"], acc=a["acc_meas"], batt_voltage=batt_v,
            radio_new=a["delivered"], radio_type=a["mtype"],
            radio_flags=a["mflags"], radio_fields=a["mfields"])
        new_logic, _ = onboard.logic_step(p.logic, base.logic, inputs)
        return c._replace(base=base._replace(
            plant=a["plant"], key=a["key"], ring=a["ring"], logic=new_logic,
            step=base.step + 1))

    def tick_nonfire(c):
        # statically non-firing offboard + non-firing mocap tick
        base = c.base
        half = env_mod.physics_tick(base, p, z3, z3, use_estimator=True,
                                    static_mocap_fire=False, static_gps_fire=False)
        nb = env_mod.EnvState(
            plant=half["plant"], logic=half["logic"], ring=half["ring"],
            offboard_acc_us=base.offboard_acc_us + p.dt_us, step=base.step + 1,
            key=half["key"], last_cmd_thrust=base.last_cmd_thrust,
            last_cmd_angvel=base.last_cmd_angvel, mocap=half["mocap"],
            mocap_acc_us=half["mocap_acc_us"], gpsimu=half["gpsimu"],
            gps_acc_us=half["gps_acc_us"], uwb=half["uwb"])
        return c._replace(base=nb)

    def tick_mocapfire(c):
        base = c.base
        half = env_mod.physics_tick(base, p, z3, z3, use_estimator=True,
                                    static_mocap_fire=True, static_gps_fire=False)
        nb = env_mod.EnvState(
            plant=half["plant"], logic=half["logic"], ring=half["ring"],
            offboard_acc_us=base.offboard_acc_us + p.dt_us, step=base.step + 1,
            key=half["key"], last_cmd_thrust=base.last_cmd_thrust,
            last_cmd_angvel=base.last_cmd_angvel, mocap=half["mocap"],
            mocap_acc_us=half["mocap_acc_us"], gpsimu=half["gpsimu"],
            gps_acc_us=half["gps_acc_us"], uwb=half["uwb"])
        return c._replace(base=nb)

    for name, body in [("phase_a", phase_a_only), ("phase_a+logic", phase_a_logic),
                       ("tick nonfire", tick_nonfire),
                       ("tick mocap-fire", tick_mocapfire),
                       ("tick full (_sim_tick)", lambda c: orchard_env._sim_tick(params, c))]:
        t = timeit(scan_of(body), state)
        print(f"{name:24s} {t*1e6:8.1f} us/tick")


if __name__ == "__main__":
    main()
