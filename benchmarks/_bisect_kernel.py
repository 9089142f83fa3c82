"""Bisect which tick stage crashes Mosaic layout inference."""
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agrifly_tpu.offboard import estimators
from agrifly_tpu.sim import env as env_mod
from agrifly_tpu.sim import orchard_env
from agrifly_tpu.sim import pallas_frame as pf


def compile_stage(name, loop_fn, state, extra=None):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    specs = tuple((tuple(np.shape(l)), jnp.dtype(l.dtype)) for l in leaves)
    leaf_avals = [jax.ShapeDtypeStruct(sh, dt) for sh, dt in specs]
    extra_aval = (jax.ShapeDtypeStruct(extra.shape, extra.dtype)
                  if extra is not None else None)

    def fn(lv, ex):
        s = jax.tree_util.tree_unflatten(treedef, lv)
        s2 = loop_fn(s, ex)
        return jax.tree_util.tree_leaves(s2)

    with estimators.replay_static_unroll():
        closed = (jax.make_jaxpr(fn)(leaf_avals, extra_aval)
                  if extra is not None else jax.make_jaxpr(lambda lv: fn(lv, None))(leaf_avals))
    consts = [np.asarray(c) for c in closed.consts]
    const_specs = tuple((tuple(c.shape), jnp.dtype(c.dtype)) for c in consts)

    def kernel(*refs):
        nc, nl = len(consts), len(specs)
        cvals = [pf._load(r, sh, dt) for r, (sh, dt) in zip(refs[:nc], const_specs)]
        i = nc
        ex = None
        if extra is not None:
            ex = refs[i][...]
            i += 1
        lvals = [pf._load(r, sh, dt) for r, (sh, dt) in zip(refs[i:i+nl], specs)]
        out_refs = refs[i+nl:]
        args = (*cvals, *lvals, ex) if extra is not None else (*cvals, *lvals)
        outs = jax.core.eval_jaxpr(closed.jaxpr, args[:nc], *args[nc:])
        for r, v, (sh, dt) in zip(out_refs, outs, specs):
            o = jnp.asarray(v)
            if jnp.dtype(dt) == jnp.bool_:
                o = o.astype(jnp.int32)
            r[...] = o.reshape(pf._canon_shape(sh))

    out_shapes = [jax.ShapeDtypeStruct(pf._canon_shape(sh), pf._io_dtype(dt))
                  for sh, dt in specs]
    n_in = len(consts) + (1 if extra is not None else 0) + len(specs)
    call = pl.pallas_call(
        kernel, out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(specs),
    )
    packed = [pf._pack(c) for c in consts]
    packed_leaves = [pf._pack(l) for l in leaves]
    args = (*packed, extra, *packed_leaves) if extra is not None else (*packed, *packed_leaves)
    t0 = time.time()
    try:
        jax.jit(lambda *a: call(*a)).lower(*args).compile()
        print(f"[{name}] OK in {time.time()-t0:.1f}s", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()
        key = [l for l in msg if "Mosaic" in l or "error" in l.lower()][:2]
        print(f"[{name}] FAIL in {time.time()-t0:.1f}s: {key}", flush=True)
        return False


def main():
    params = orchard_env.make_params(use_pallas=True)
    state = orchard_env.init_state(params, jax.random.PRNGKey(0))
    noise = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (16, 6), jnp.float32))
    p = params.base
    z3 = jnp.zeros(3, jnp.float32)

    def s1(s, ex):
        base = s.base
        a = env_mod.physics_phase_a(base, p, z3, z3, noise=(ex[0, 0:3], ex[0, 3:6]))
        return s._replace(base=base._replace(
            plant=a["plant"], ring=a["ring"], step=base.step + 1))

    def s2(s, ex):
        base = s.base
        from agrifly_tpu.models import logic as onboard
        a = env_mod.physics_phase_a(base, p, z3, z3, noise=(ex[0, 0:3], ex[0, 3:6]))
        inputs = onboard.null_inputs()._replace(
            gyro=a["gyro_meas"], acc=a["acc_meas"],
            batt_voltage=p.logic.batt_critical * 1.2,
            radio_new=a["delivered"], radio_type=a["mtype"],
            radio_flags=a["mflags"], radio_fields=a["mfields"])
        new_logic, _ = onboard.logic_step(p.logic, base.logic, inputs)
        return s._replace(base=base._replace(
            plant=a["plant"], ring=a["ring"], logic=new_logic, step=base.step + 1))

    def s3(s, ex):
        base = s.base
        half = env_mod.physics_tick(base, p, z3, z3, use_estimator=True,
                                    noise=(ex[0, 0:3], ex[0, 3:6]))
        nb = env_mod.EnvState(
            plant=half["plant"], logic=half["logic"], ring=half["ring"],
            offboard_acc_us=base.offboard_acc_us + p.dt_us, step=base.step + 1,
            key=half["key"], last_cmd_thrust=base.last_cmd_thrust,
            last_cmd_angvel=base.last_cmd_angvel, mocap=half["mocap"],
            mocap_acc_us=half["mocap_acc_us"], gpsimu=half["gpsimu"],
            gps_acc_us=half["gps_acc_us"], uwb=half["uwb"])
        return s._replace(base=nb)

    def s4(s, ex):
        return orchard_env._sim_tick(params, s, jnp.stack([ex[0, 0:3], ex[0, 3:6]]))

    def s5(s, ex):
        def body(i, s):
            sel = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) == i
            n_i = jnp.where(sel, ex, 0.0).sum(0)
            return orchard_env._sim_tick(params, s, jnp.stack([n_i[0:3], n_i[3:6]]))
        return jax.lax.fori_loop(0, 16, body, s)

    ex = jnp.asarray(noise)
    for name, fn in [("S1 phase_a", s1), ("S2 +logic", s2),
                     ("S3 physics_tick", s3), ("S4 _sim_tick", s4),
                     ("S5 16-tick fori", s5)]:
        try:
            compile_stage(name, fn, state, extra=ex)
        except Exception:
            print(f"[{name}] EXC:", traceback.format_exc()[-800:], flush=True)


if __name__ == "__main__":
    main()
