"""Mosaic-safe jaxpr evaluation: bool-free values + concat-free assembly.

`jax.vmap` of the single-vehicle tick program (sim/pallas_frame.py) is
value-correct but un-lowerable by Mosaic: batching turns scalar booleans
into i1 *vectors* (broadcast/reshape/squeeze of i1 have no Mosaic rules)
and scalar stacks into minor-dim concatenates of (B, 1) vector pieces
(also unsupported; see the Mosaic notes in CLAUDE.md and the respelling
rules in ops/lin3.py).  Rather than hand-respelling the batched tick —
thousands of ops — this module re-evaluates the traced jaxpr with two
mechanical, value-identical rewrites applied at every equation:

1. **bool -> int32 carriers.** Every boolean value is represented as an
   int32 0/1 array.  Comparisons convert their (same-shape, transient —
   the one i1 form Mosaic handles) result immediately; and/or/xor become
   bitwise ops on carriers; `not` becomes `x ^ 1`; reduce_or/reduce_and
   become max/min; select_n tests `pred != 0` at the use site.  No i1
   broadcast, reshape, squeeze, concat, or int->bool truncation survives.

2. **minor-dim concatenate -> masked-select assembly.** A concatenate on
   the last axis of rank >= 2 operands is rebuilt column-by-column:
   extent-1 operands broadcast straight into their slot under an
   iota-mask select; wider operands have each column extracted first by
   a masked lane reduction (exact: one live term plus zeros).  Identical
   to ops/lin3.assemble_cols3, generalized.  The only value deviation is
   -0.0 + 0.0 = +0.0 in the column-extract sum, which compares equal.

Scalar select predicates are broadcast to the output shape (Mosaic has
no scalar-pred vector select).  `scan` and `jit` sub-jaxprs are rebuilt
recursively with laundered bodies (carried booleans ride as carriers).

Used by sim/pallas_frame.frame_ticks_batched to run the vmapped 16-tick
fleet block as one Pallas kernel.  Pure function of the jaxpr: evaluation
happens at kernel trace time, so XLA/Mosaic sees only the rewritten ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.extend import core as jex_core

_I32 = jnp.int32


def to_carrier(x):
    """Convert a value to its laundered representation (bool -> int32)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        return x.astype(_I32)
    return x


def from_carrier(x, dtype):
    """Convert a laundered value back to its jaxpr dtype."""
    if jnp.dtype(dtype) == jnp.bool_ and jnp.asarray(x).dtype != jnp.bool_:
        return x != 0
    return x


def _np_carrier(x):
    a = np.asarray(x)
    if a.dtype == np.bool_:
        return a.astype(np.int32)
    return a


def _is_bool(var) -> bool:
    return var.aval.dtype == jnp.bool_


def _minor_concat(invals, out_shape, dtype):
    """concatenate(..., dimension=last) on rank>=2 operands, respelled as
    iota-masked select assembly (no Mosaic minor-dim vector concat)."""
    dim = len(out_shape) - 1
    iota = lax.broadcasted_iota(_I32, out_shape, dim)
    acc = jnp.zeros(out_shape, dtype)
    off = 0
    for o in invals:
        e = o.shape[dim]
        if e == 1:
            acc = jnp.where(iota == off, jnp.broadcast_to(o, out_shape), acc)
        else:
            sub = lax.broadcasted_iota(_I32, o.shape, dim)
            zero = jnp.zeros((), dtype)
            for j in range(e):
                # masked lane reduction: exactly one live term plus zeros
                col = jnp.sum(jnp.where(sub == j, o, zero), axis=dim,
                              keepdims=True)
                acc = jnp.where(iota == off + j,
                                jnp.broadcast_to(col, out_shape), acc)
        off += e
    return acc


def _blendable(c):
    """True if _blend_rank1 is exact for this dtype (32-bit int/float)."""
    dt = jnp.dtype(c.dtype)
    return dt in (jnp.dtype(jnp.int32), jnp.dtype(jnp.uint32),
                  jnp.dtype(jnp.float32))


def _blend_rank1(m, c0, c1):
    """select(m, c1, c0) as the exact delta-blend c0 + m*(c1-c0).

    m is an int32 0/1 carrier.  Integer arithmetic wraps (two's
    complement) in XLA, so c0 + 1*(c1-c0) == c1 and c0 + 0*(...) == c0
    bit-for-bit for int32/uint32.  float32 goes through an int32 bitcast
    view, which preserves every payload (NaN, -0.0) exactly."""
    dt = jnp.dtype(c0.dtype)
    if dt == jnp.dtype(jnp.float32):
        i0 = lax.bitcast_convert_type(c0, jnp.int32)
        i1 = lax.bitcast_convert_type(c1, jnp.int32)
        return lax.bitcast_convert_type(i0 + m * (i1 - i0), jnp.float32)
    m = m.astype(dt)
    return c0 + m * (c1 - c0)


def _broadcast_in_dim(x, eqn):
    """broadcast_in_dim with leading-mapped operand dims, respelled to add
    ONE trailing dim per step.  Mosaic lowers a rank-increasing broadcast
    by first shape-casting the operand to the output rank ((B,) -> (B,m,n)
    goes via tpu.reshape (B,) -> (B,1,1)), and that multi-dim shape cast
    is unsupported ("infer-vector-layout: unsupported shape cast" — the
    fleet kernel's hardware-compile blocker).  Appending a single trailing
    dim at a time ((B,) -> (B,m) -> (B,m,n)) lowers fine (probed on v5e).
    Value-identical: same elements, same dtype."""
    dims = tuple(int(d) for d in eqn.params["broadcast_dimensions"])
    oshape = tuple(eqn.params["shape"])
    in_rank, out_rank = len(x.shape), len(oshape)
    if (out_rank - in_rank >= 2 and dims == tuple(range(in_rank))):
        y = x
        for k in range(in_rank, out_rank):
            y = lax.broadcast_in_dim(y, oshape[:k + 1], tuple(range(k)))
        return y
    return eqn.primitive.bind(x, **eqn.params)


def eval_jaxpr(jaxpr, consts, *args):
    """Evaluate `jaxpr` with the laundering rewrites.

    `consts` and `args` must already be carriers (bool leaves as int32;
    use `to_carrier`).  Returns carriers for bool outputs.
    """
    env = {}

    def read(v):
        if isinstance(v, jex_core.Literal):
            return _np_carrier(v.val)
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts, strict=True):
        write(v, c)
    for v, a in zip(jaxpr.invars, args, strict=True):
        write(v, a)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name

        if name in ("eq", "ne", "lt", "le", "gt", "ge"):
            out = eqn.primitive.bind(*invals, **eqn.params).astype(_I32)

        elif name == "not" and _is_bool(eqn.invars[0]):
            out = invals[0] ^ 1

        elif name in ("and", "or", "xor"):
            # bitwise bind is logical on 0/1 carriers and unchanged on ints
            out = eqn.primitive.bind(*invals, **eqn.params)

        elif name == "select_n" and _is_bool(eqn.invars[0]):
            pred, *cases = invals
            oshape = cases[0].shape
            if pred.shape != oshape:
                pred = jnp.broadcast_to(pred.reshape((1,) * len(oshape)),
                                        oshape)
            if len(oshape) == 1 and len(cases) == 2 and _blendable(cases[0]):
                # rank-1 i1 selects crash Mosaic's VectorLayout join when
                # the pred rode through a minor-dim squeeze (a vmapped
                # `vec[i]` pick) before meeting a loop-carried operand
                # (layout.h CHECK "arr.size() >= layout_rank").  Exact
                # delta-blend instead: c0 + m*(c1-c0) on 32-bit integer
                # views (wraparound-exact for ints; f32 via bitcast so
                # NaN/-0 payloads are preserved bit-for-bit).
                # The delta-blend is only exact for a strictly-0/1 mask;
                # laundered bool carriers are non-negative ints (compares
                # → 0/1, and/or/add combos stay >= 0), so clamp to 1 in
                # case an OR ever rode through an add (carrier == 2).
                out = _blend_rank1(lax.min(pred, jnp.ones_like(pred)),
                                   cases[0], cases[1])
            else:
                # same-shape transient i1: the one form Mosaic lowers
                out = lax.select_n(pred != 0, *cases)

        elif name == "convert_element_type":
            new = eqn.params["new_dtype"]
            src_bool = _is_bool(eqn.invars[0])
            if jnp.dtype(new) == jnp.bool_:
                out = (invals[0] != 0).astype(_I32)
            elif src_bool:
                out = invals[0].astype(new)
            else:
                out = eqn.primitive.bind(*invals, **eqn.params)

        elif name == "reduce_or":
            out = jnp.max(invals[0], axis=eqn.params["axes"])

        elif name == "reduce_and":
            out = jnp.min(invals[0], axis=eqn.params["axes"])

        elif name == "reduce_xor":
            out = jnp.sum(invals[0], axis=eqn.params["axes"],
                          dtype=_I32) & 1

        elif name == "concatenate":
            dim = eqn.params["dimension"]
            oaval = eqn.outvars[0].aval
            rank = len(oaval.shape)
            if rank >= 2 and dim == rank - 1:
                dtype = _I32 if oaval.dtype == jnp.bool_ else oaval.dtype
                out = _minor_concat(invals, oaval.shape, dtype)
            else:
                out = eqn.primitive.bind(*invals, **eqn.params)

        elif name == "broadcast_in_dim":
            out = _broadcast_in_dim(invals[0], eqn)

        elif name == "iota":
            if jnp.dtype(eqn.params["dtype"]) == jnp.bool_:
                p = dict(eqn.params, dtype=jnp.dtype(_I32))
                out = (eqn.primitive.bind(*invals, **p) != 0).astype(_I32)
            else:
                out = eqn.primitive.bind(*invals, **eqn.params)

        elif name == "scan":
            out = _eval_scan(eqn, invals)

        elif name in ("jit", "pjit", "closed_call", "core_call",
                      "custom_jvp_call", "custom_vjp_call",
                      "custom_vjp_call_jaxpr", "remat", "checkpoint"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") \
                or eqn.params.get("fun_jaxpr")
            if isinstance(sub, jex_core.ClosedJaxpr):
                out = eval_jaxpr(sub.jaxpr,
                                 [_np_carrier(c) for c in sub.consts],
                                 *invals)
            else:  # open jaxpr: consts ride in invals
                out = eval_jaxpr(sub, [], *invals)

        elif name == "while":
            out = _eval_while(eqn, invals)

        elif name == "cond":
            out = _eval_cond(eqn, invals)

        else:
            out = eqn.primitive.bind(*invals, **eqn.params)

        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, out, strict=True):
                write(v, o)
        else:
            write(eqn.outvars[0], out)

    return [read(v) for v in jaxpr.outvars]


def _canon_carry(v):
    """Canonicalize a rank-1 loop carry by scalar re-assembly.

    Mosaic rotates scan-carry vector layouts between iterations; when a
    body value with an implicit-dim layout (e.g. a minor-dim squeeze, a
    2-D reduce) meets such a carry, VectorLayout inference dies with
    "Check failed: arr.size() >= layout_rank(implicit_dim)".  Rebuilding
    every rank-1 carry from scalar extracts at the body boundary (the
    ops/lin3.relayout trick, applied mechanically) pins each iteration's
    carry to the canonical layout.  Value-identical; XLA folds it away on
    the CPU/jnp path."""
    if getattr(v, "ndim", 0) == 1 and v.shape[0] > 1:
        return jnp.stack([v[i] for i in range(v.shape[0])])
    return v


def _eval_scan(eqn, invals):
    p = eqn.params
    closed = p["jaxpr"]
    nc, ncar = p["num_consts"], p["num_carry"]
    consts = invals[:nc]
    carry = tuple(invals[nc:nc + ncar])
    xs = tuple(invals[nc + ncar:])
    jconsts = [_np_carrier(c) for c in closed.consts]

    def body(c, x):
        outs = eval_jaxpr(closed.jaxpr, jconsts, *consts, *c,
                          *(x if x is not None else ()))
        return (tuple(_canon_carry(o) for o in outs[:ncar]),
                tuple(outs[ncar:]))

    carry, ys = lax.scan(body, carry, xs if xs else None,
                         length=p["length"], reverse=p["reverse"],
                         unroll=p.get("unroll", 1))
    return list(carry) + list(ys)


def _eval_while(eqn, invals):
    p = eqn.params
    cn, bn = p["cond_nconsts"], p["body_nconsts"]
    cconsts = invals[:cn]
    bconsts = invals[cn:cn + bn]
    init = tuple(invals[cn + bn:])
    cj, bj = p["cond_jaxpr"], p["body_jaxpr"]
    cjc = [_np_carrier(c) for c in cj.consts]
    bjc = [_np_carrier(c) for c in bj.consts]

    def cond(c):
        (out,) = eval_jaxpr(cj.jaxpr, cjc, *cconsts, *c)
        return out != 0 if out.dtype != jnp.bool_ else out

    def body(c):
        return tuple(eval_jaxpr(bj.jaxpr, bjc, *bconsts, *c))

    return list(lax.while_loop(cond, body, init))


def _eval_cond(eqn, invals):
    branches = eqn.params["branches"]
    index, *ops = invals

    def mk(br):
        brc = [_np_carrier(c) for c in br.consts]
        return lambda *o: tuple(eval_jaxpr(br.jaxpr, brc, *o))

    return list(lax.switch(index, [mk(br) for br in branches], *ops))
