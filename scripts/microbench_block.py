#!/usr/bin/env python
"""Per-bucket microbenchmarks of the encoder block at flagship stage shapes.

Times, standalone on the real chip (best-of-N, K-chained in one jit):
  * dwconv fwd / fwd+bwd on the dense grid per stage
  * the gathered block-MLP chain (LN->pw1->gelu->GRN->pw2->residual)
    fwd / fwd+bwd per stage, as XLA lowers it
  * the same chain through the spill-g Pallas kernel (when present)

Used to target/validate fused-kernel work (ROADMAP r3).  Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_block.py
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

N, KVIS = 256, 19
STAGES = [(56, 40, 8), (28, 80, 4), (14, 160, 2), (7, 320, 1)]


def timeit(fn, *args, k=30, rounds=4):
    import jax

    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = jitted(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    print(f"{'shape':24s} {'dw_fwd':>8s} {'dw_fb':>8s} {'mlp_fwd':>8s} {'mlp_fb':>8s}  (ms, K=30-chained)")
    for h, c, p in STAGES:
        x = jax.random.normal(key, (N, h, h, c), jnp.bfloat16)
        w = jax.random.normal(key, (7, 7, 1, c), jnp.bfloat16)

        def dw(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def chain(fn):
            # sum 30 evaluations with perturbed inputs (defeats CSE) so the
            # per-eval time can be read off one dispatch
            def many(*a):
                acc = jnp.float32(0)
                for i in range(30):
                    acc = acc + fn(a[0] + jnp.bfloat16(i) * jnp.bfloat16(1e-8),
                                   *a[1:]).astype(jnp.float32).mean()
                return acc
            return many

        dw_fwd = timeit(chain(dw), x, w, k=1) / 30 * 1e3

        def dw_fb(x, w):
            def loss(x, w):
                return dw(x, w).astype(jnp.float32).sum()
            g = jax.grad(loss, argnums=(0, 1))(x, w)
            return g[0].astype(jnp.float32).mean() + g[1].astype(jnp.float32).mean()

        dw_fb_t = timeit(chain(dw_fb), x, w, k=1) / 30 * 1e3

        # gathered block-MLP chain at this stage's row shape
        m = N * KVIS * p * p
        t = jax.random.normal(key, (m, c), jnp.bfloat16)
        xr = jax.random.normal(key, (m, c), jnp.bfloat16)
        lns = jnp.ones((c,), jnp.float32)
        lnb = jnp.zeros((c,), jnp.float32)
        w1 = jax.random.normal(key, (c, 4 * c), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((4 * c,), jnp.float32)
        gam = jnp.ones((4 * c,), jnp.float32) * 0.5
        bet = jnp.zeros((4 * c,), jnp.float32)
        w2 = jax.random.normal(key, (4 * c, c), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((c,), jnp.float32)

        from mmearth_tpu.ops.fused_block import fused_block_mlp_reference

        def mlp(t, xr):
            return fused_block_mlp_reference(t, xr, jnp.ones((m, 1), jnp.bfloat16),
                                             lns, lnb, w1, b1, gam, bet, w2, b2)

        mlp_fwd = timeit(chain(mlp), t, xr, k=1) / 30 * 1e3

        def mlp_fb(t, xr):
            def loss(t, xr):
                return mlp(t, xr).astype(jnp.float32).sum()
            g = jax.grad(loss, argnums=(0, 1))(t, xr)
            return g[0].astype(jnp.float32).mean()

        mlp_fb_t = timeit(chain(mlp_fb), t, xr, k=1) / 30 * 1e3

        print(f"h={h:3d} c={c:3d} rows={m:7d} {dw_fwd:8.3f} {dw_fb_t:8.3f} {mlp_fwd:8.3f} {mlp_fb_t:8.3f}")


if __name__ == "__main__":
    main()
