"""Jittable, batchable linear sum assignment (exact Hungarian algorithm).

The reference solves its DETR matching LSAP with
`scipy.optimize.linear_sum_assignment` per sample on the CPU
(music_detr/matcher.py:89-91) — a device->host sync every step.  Here the
same exact O(n^3) shortest-augmenting-path algorithm (the classic
Jonker-Volgenant / e-maxx formulation that scipy itself implements) is
expressed with `lax.while_loop`/`fori_loop` so it jit-compiles, runs on
TPU, and vmaps over the batch.  Problem sizes are tiny (#queries x
#targets, both <= ~16), so fixed iteration bounds are cheap.

In the shipped MaDe config (#queries = 1, 1 target) the assignment is a
trivial argmin; `solve` handles the general rectangular case so
`num_moment_queries > 1` works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def _solve_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LSAP on a square [n, n] float cost matrix.

    Returns col_to_row: [n] int32, col_to_row[j] = row assigned to column j.
    Always a perfect matching (costs must be finite).
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)

    def assign_row(i, state):
        u, v, p = state
        # u: [n+1] row potentials (slot n = scratch), v: [n+1] col potentials
        # (slot n = virtual column), p: [n+1] col -> row assignment (-1 free).
        p = p.at[n].set(i)
        init = (
            jnp.int32(n),                      # j0: current column
            jnp.full(n + 1, _INF),             # minv
            jnp.zeros(n + 1, jnp.int32),       # way: predecessor column
            jnp.zeros(n + 1, dtype=bool),      # used
            u,
            v,
            p,
        )

        def cond(carry):
            j0, _, _, _, _, _, p = carry
            return p[j0] != -1

        def body(carry):
            j0, minv, way, used, u, v, p = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0, :] - u[i0] - v[:n]
            better = (~used[:n]) & (cur < minv[:n])
            minv = minv.at[:n].set(jnp.where(better, cur, minv[:n]))
            way = way.at[:n].set(jnp.where(better, j0, way[:n]))
            masked = jnp.where(used[:n], _INF, minv[:n])
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # Potential update: used cols' rows gain delta, used cols lose it,
            # unused cols' tentative distances shrink by it.
            row_idx = jnp.where(used, p, n)        # scratch slot for unused
            u = u.at[row_idx].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(~used, delta, 0.0)
            return (j1, minv, way, used, u, v, p)

        j0, _, way, _, u, v, p = jax.lax.while_loop(cond, body, init)

        # Unwind the augmenting path: at most n+1 hops.
        def unwind(_, carry):
            j0, p, done = carry
            j1 = way[j0]
            p_new = p.at[j0].set(p[j1])
            take = ~done
            p = jnp.where(take, p_new, p)
            j0_next = jnp.where(take, j1, j0)
            done = done | (j0_next == n)
            return (j0_next, p, done)

        j0, p, _ = jax.lax.fori_loop(0, n + 1, unwind, (j0, p, j0 == n))
        return (u, v, p)

    u0 = jnp.zeros(n + 1)
    v0 = jnp.zeros(n + 1)
    p0 = jnp.full(n + 1, -1, jnp.int32)
    _, _, p = jax.lax.fori_loop(0, n, assign_row, (u0, v0, p0))
    return p[:n]


def solve(cost: jnp.ndarray, pad_value: float = 1e6) -> jnp.ndarray:
    """Rectangular LSAP via square padding.

    cost: [R, C].  Pads to n = max(R, C) with `pad_value` (constant, so
    padding never distorts which real pairs are optimal) and solves exactly.

    Returns col_to_row: [C] int32 where entries >= R mean "column unmatched"
    (assigned to a padded row).  min(R, C) columns get real rows, and they
    form the same optimal subset scipy's rectangular solver picks.
    """
    r, c = cost.shape
    n = max(r, c)
    sq = jnp.full((n, n), jnp.float32(pad_value))
    sq = jax.lax.dynamic_update_slice(sq, cost.astype(jnp.float32), (0, 0))
    return _solve_square(sq)[:c]


solve_batch = jax.vmap(solve, in_axes=(0,))
