"""Analytic FLOP counting by walking a jaxpr.

XLA's ``compiled.cost_analysis()`` is unreliable through the PJRT plugin used
here (it reported 0.16 GFLOP/sample for a step that analytically does ~10x
that), so the bench computes MFU from the jaxpr instead: every
``dot_general`` and ``conv_general_dilated`` equation contributes
2 * prod(batch_dims) * M * N * K MACs-as-FLOPs, recursing through closed
calls / pjit / scan (scan bodies multiply by trip count) / custom-vjp.
Elementwise work is excluded — this is the MXU-relevant count, the same
convention as the published MFU figures it is compared against.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    batch = math.prod(a.shape[d] for d in lhs_b)
    k = math.prod(a.shape[d] for d in lhs_c)
    m = math.prod(
        a.shape[d] for d in range(a.ndim) if d not in lhs_c and d not in lhs_b
    )
    n = math.prod(
        b.shape[d] for d in range(b.ndim) if d not in rhs_c and d not in rhs_b
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    # NOTE: no division by feature_group_count — rhs.shape[rhs_spec[1]] is
    # already the *per-group* input channel count in XLA's convention.
    spatial_k = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    cin = rhs.shape[dn.rhs_spec[1]]  # per-group input channels
    n_out = math.prod(out.shape)  # batch * out-spatial * cout
    return 2.0 * n_out * spatial_k * cin


def jaxpr_flops(jaxpr) -> float:
    """Total dot/conv FLOPs of a (closed or open) jaxpr, recursively."""
    inner = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0.0
    for eqn in inner.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * jaxpr_flops(eqn.params["jaxpr"])
        elif name == "while":
            # trip count unknowable statically; count one iteration
            total += jaxpr_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            branches = [jaxpr_flops(b) for b in eqn.params["branches"]]
            total += max(branches) if branches else 0.0
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if key in eqn.params:
                    total += jaxpr_flops(eqn.params[key])
                    break
    return total


def step_flops(fn, *args, **kwargs) -> float:
    """FLOPs of one call of ``fn`` (typically a train step incl. fwd+bwd)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return jaxpr_flops(closed)
