"""Trace-time flag: are we tracing inside a Pallas TPU kernel?

A few ops on the fused-tick path have two value-identical spellings: one
that XLA fuses best on the batched jnp path (lax.scan sweeps, block
concatenates) and one that Mosaic can lower inside a kernel (static
unrolls, scalar-extract assembly). sim/pallas_frame.py enables this flag
while building the kernel jaxpr; everything else sees the default path.
"""

from __future__ import annotations

import contextlib

_ENABLED = False


def enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def pallas_safe():
    global _ENABLED
    prev = _ENABLED
    _ENABLED = True
    try:
        yield
    finally:
        _ENABLED = prev
