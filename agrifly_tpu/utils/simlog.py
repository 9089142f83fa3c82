"""CSV run logging with the demo's column schema.

The reference writes a wide CSV row per offboard tick
(Simulator/Rappids_Simulator/main.cpp:266-270): sim time, true state,
motor forces, estimator state, desired state, panic flag, last radio
command. This logger consumes stacked rollout outputs (device arrays) and
writes the same schema through the native buffered writer.
"""

from __future__ import annotations

import numpy as np

from agrifly_tpu.io.native import NativeCsvLogger
from agrifly_tpu.ops import rotation as rot

HEADER = (
    "t,posx,posy,posz,velx,vely,velz,attY,attP,attR,angvelx,angvely,angvelz,"
    "m1,m2,m3,m4,"
    "estposx,estposy,estposz,estvelx,estvely,estvelz,esty,estp,estr,"
    "estangx,estangy,estangz,"
    "desposx,desposy,desposz,desvelx,desvely,desvelz,panic,r1,r2,r3,r4"
)


def write_rollout_csv(path, traj_outputs, dt=1.0 / 500.0, des_pos=None,
                      est=None, last_cmd=None):
    """traj_outputs: env.StepOutputs with stacked (T, ...) leaves."""
    pos = np.asarray(traj_outputs.pos, np.float64)
    vel = np.asarray(traj_outputs.vel, np.float64)
    att = np.asarray(traj_outputs.att, np.float64)
    angvel = np.asarray(traj_outputs.angvel, np.float64)
    speeds = np.asarray(traj_outputs.motor_speeds, np.float64)
    panic = np.asarray(traj_outputs.panic_reason, np.float64)
    T = pos.shape[0]

    import jax.numpy as jnp

    y, p, r = rot.to_euler_ypr(jnp.asarray(att))
    ypr = np.stack([np.asarray(y), np.asarray(p), np.asarray(r)], axis=1)

    zeros3 = np.zeros((T, 3))
    est_pos = np.asarray(est[0], np.float64) if est else zeros3
    est_vel = np.asarray(est[1], np.float64) if est else zeros3
    est_ypr = np.asarray(est[2], np.float64) if est else zeros3
    est_av = np.asarray(est[3], np.float64) if est else zeros3
    des = np.broadcast_to(np.asarray(des_pos, np.float64), (T, 3)) if des_pos is not None else zeros3
    cmd = np.asarray(last_cmd, np.float64) if last_cmd is not None else np.zeros((T, 4))

    t = (np.arange(T) + 1) * dt
    rows = np.concatenate(
        [
            t[:, None], pos, vel, ypr, angvel, speeds,
            est_pos, est_vel, est_ypr, est_av,
            des, zeros3[:, :3], panic[:, None], cmd,
        ],
        axis=1,
    )
    with NativeCsvLogger(path, HEADER) as lg:
        lg.write_rows(rows)
    return rows.shape
