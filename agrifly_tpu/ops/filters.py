"""Discrete IIR low-pass filters as scan-carried functional state.

First order: y = c*y_prev + (1-c)*x with c = exp(-dt*wc)
(Common/Common/Math/LowPassFilterFirstOrder.hpp).
Second order: bilinear-type Butterworth-ish biquad with the reference's
coefficient formulas (LowPassFilterSecondOrder.hpp:36-48). State is a small
pytree; `apply` returns (new_state, output) so filters thread through
lax.scan and vmap over env/vector axes without modification.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class Lp1State(NamedTuple):
    y: jnp.ndarray
    coeff: jnp.ndarray  # scalar


def lp1_init(sampling_period, cutoff_rad_s, init_value):
    init_value = jnp.asarray(init_value, dtype=jnp.float32)
    c = math.exp(-float(sampling_period) * float(cutoff_rad_s))
    return Lp1State(y=init_value, coeff=jnp.float32(c))


def lp1_apply(state: Lp1State, x):
    c = state.coeff
    y = jnp.where(c <= 0.0, x, c * state.y + (1.0 - c) * x)
    return Lp1State(y=y, coeff=c), y


class Lp2State(NamedTuple):
    xm0: jnp.ndarray
    xm1: jnp.ndarray
    ym0: jnp.ndarray
    ym1: jnp.ndarray


class Lp2Coeffs(NamedTuple):
    a1: jnp.ndarray
    a2: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray


def lp2_coeffs(sampling_period, cutoff_rad_s) -> Lp2Coeffs:
    # Bit-exact mirror of LowPassFilterSecondOrder<float,_>::Initialise
    # (TYPE_RATE = float in the onboard stack): every intermediate product
    # rounds to f32, and b2's left-to-right `2 * dt * dt * wc * wc`
    # associates differently from `2 * (dt*dt*wc*wc)`. Computing in f64 and
    # rounding once leaves the recursive filter ~2e-5 off the reference
    # after a few hundred ticks (measured vs the C++ golden logicdbg dump).
    import numpy as np

    f = np.float32
    dt = f(sampling_period)
    wc = f(cutoff_rad_s)
    s2 = f(math.sqrt(2.0))
    two, four = f(2), f(4)
    den = dt * dt * wc * wc + two * s2 * dt * wc + four
    a1 = (dt * dt * wc * wc - two * s2 * dt * wc + four) / den
    a2 = two * (dt * dt * wc * wc - four) / den
    b0 = dt * dt * wc * wc / den
    b1 = b0
    b2 = two * dt * dt * wc * wc / den
    f = jnp.float32
    return Lp2Coeffs(f(a1), f(a2), f(b0), f(b1), f(b2))


def lp2_init(init_value) -> Lp2State:
    v = jnp.asarray(init_value, dtype=jnp.float32)
    return Lp2State(xm0=v, xm1=v, ym0=v, ym1=v)


def lp2_apply(coeffs: Lp2Coeffs, state: Lp2State, x):
    # Same add-tree as the reference Apply (LowPassFilterSecondOrder.hpp:
    # 54-58): b2*x, += (b0*xm0 + b1*xm1), += (-a1*ym0 - a2*ym1). A
    # left-to-right chain rounds differently and the recursive feedback
    # integrates the per-step ulp into a ~2e-5 quasi-steady offset
    # (measured vs the C++ golden logicdbg dump).
    out = coeffs.b2 * x + (coeffs.b0 * state.xm0 + coeffs.b1 * state.xm1)
    out = out + (-(coeffs.a1 * state.ym0) - coeffs.a2 * state.ym1)
    new = Lp2State(xm0=state.xm1, xm1=x, ym0=state.ym1, ym1=out)
    return new, out


def lp2_value(state: Lp2State):
    return state.ym1
