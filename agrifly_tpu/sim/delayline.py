"""Fixed-size FIFO modeling radio transport latency inside the jitted loop.

Replaces the reference's std::queue-based CommunicationsDelay
(Components/Components/Simulation/CommunicationsDelay.hpp:10-52) with a ring
buffer of static capacity: messages become visible `delay` after being
pushed. Delivery uses strict '>' on (now - send)*dt so a command pushed at
step j is consumed by the onboard logic at step j + delay/dt + 1, matching
the reference's end-of-iteration delivery + next-iteration consumption.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

CAPACITY = 32


class RadioRing(NamedTuple):
    types: jnp.ndarray  # (K,) int32
    flags: jnp.ndarray  # (K,) int32
    fields: jnp.ndarray  # (K, 10) int32
    send_step: jnp.ndarray  # (K,) int32
    head: jnp.ndarray  # int32
    count: jnp.ndarray  # int32


def init() -> RadioRing:
    return RadioRing(
        types=jnp.zeros(CAPACITY, jnp.int32),
        flags=jnp.zeros(CAPACITY, jnp.int32),
        fields=jnp.zeros((CAPACITY, 10), jnp.int32),
        send_step=jnp.zeros(CAPACITY, jnp.int32),
        head=jnp.int32(0),
        count=jnp.int32(0),
    )


def push(ring: RadioRing, msg_type, msg_flags, msg_fields, step, do_push):
    """Append a message (dropped silently if full, like a saturated radio)."""
    slot = (ring.head + ring.count) % CAPACITY
    can = do_push & (ring.count < CAPACITY)
    types = jnp.where(can, ring.types.at[slot].set(msg_type), ring.types)
    flags = jnp.where(can, ring.flags.at[slot].set(msg_flags), ring.flags)
    fields = jnp.where(can, ring.fields.at[slot].set(msg_fields), ring.fields)
    send_step = jnp.where(can, ring.send_step.at[slot].set(step), ring.send_step)
    return ring._replace(
        types=types, flags=flags, fields=fields, send_step=send_step,
        count=ring.count + can.astype(jnp.int32),
    )


def pop_due(ring: RadioRing, step, dt_us, delay_us):
    """Pop the front message if its transport delay has elapsed.

    Returns (ring, delivered: bool, type, flags, fields).
    """
    has = ring.count > 0
    age_us = (step - ring.send_step[ring.head]) * dt_us
    due = has & (age_us > delay_us)
    mtype = ring.types[ring.head]
    mflags = ring.flags[ring.head]
    mfields = ring.fields[ring.head]
    new_ring = ring._replace(
        head=jnp.where(due, (ring.head + 1) % CAPACITY, ring.head),
        count=jnp.where(due, ring.count - 1, ring.count),
    )
    return new_ring, due, mtype, mflags, mfields
