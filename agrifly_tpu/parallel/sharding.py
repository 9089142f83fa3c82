"""Multi-chip scale-out: shard the env axis over a device mesh.

The reference's only parallel dimension is the vehicle/env batch (SURVEY.md
§2 "Parallelism & distribution"): envs never communicate, so scale-out is
embarrassingly parallel — the env axis shards over ICI and the only
collectives are fleet-metric reductions (psum/pmean). This module builds the
mesh, places batched state on it, and wraps the fused sim step in shard_map
with a cross-chip metrics reduction so XLA lays the reduction onto ICI.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agrifly_tpu.sim import env as env_mod

ENV_AXIS = "env"


def make_mesh(devices=None) -> Mesh:
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices).reshape(-1), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batched env state pytrees."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_fleet(params, mesh: Mesh, n_envs: int, base_seed: int = 0):
    """Batched env states sharded over the mesh (n_envs % n_devices == 0)."""
    keys = jax.random.split(jax.random.PRNGKey(base_seed), n_envs)
    states = jax.vmap(lambda k: env_mod.init_state(params, k))(keys)
    shard = env_sharding(mesh)
    return jax.device_put(states, jax.tree_util.tree_map(lambda _: shard, states))


class FleetMetrics(NamedTuple):
    """Cross-fleet reductions (ride ICI as psums)."""

    mean_pos: jnp.ndarray  # (3,)
    mean_speed: jnp.ndarray  # scalar
    num_panicked: jnp.ndarray  # int32
    max_tilt_cos: jnp.ndarray  # scalar: worst (most tilted) cos(tilt)


def _local_step(params, states, cmds, n_env_total, n_substeps):
    """Per-shard body: scan the fused step, then psum fleet metrics."""

    def body(carry, _):
        new_states, _ = jax.vmap(env_mod.step, in_axes=(None, 0, 0))(params, carry, cmds)
        return new_states, None

    states, _ = jax.lax.scan(body, states, None, length=n_substeps)

    from agrifly_tpu.ops import rotation as rot

    up_z = jax.vmap(lambda q: rot.rotate(q, jnp.array([0.0, 0.0, 1.0], jnp.float32))[2])(
        states.plant.att
    )
    inv_n = 1.0 / n_env_total
    metrics = FleetMetrics(
        mean_pos=jax.lax.psum(states.plant.pos.sum(0) * inv_n, ENV_AXIS),
        mean_speed=jax.lax.psum(
            jnp.linalg.norm(states.plant.vel, axis=-1).sum() * inv_n, ENV_AXIS
        ),
        num_panicked=jax.lax.psum(
            (states.logic.fs == 3).sum().astype(jnp.int32), ENV_AXIS
        ),
        max_tilt_cos=-jax.lax.pmax(-up_z.min(), ENV_AXIS),
    )
    return states, metrics


def make_fleet_step(params, mesh: Mesh, n_envs: int, n_substeps: int = 1):
    """jitted (states, cmds) -> (states, FleetMetrics), env axis sharded."""
    spec_env = P(ENV_AXIS)

    fn = jax.shard_map(
        partial(_local_step, params, n_env_total=n_envs, n_substeps=n_substeps),
        mesh=mesh,
        in_specs=(spec_env, spec_env),
        out_specs=(spec_env, P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=0)
