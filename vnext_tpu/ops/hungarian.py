"""Device-side exact linear assignment (Hungarian / Jonker-Volgenant).

Replaces the reference's scipy ``linear_sum_assignment`` host round-trip
(projects/SeqFormer/seqformer/models/matcher.py:95 — called per decoder layer, a
GPU->CPU sync each time; SURVEY.md §3.1 "hidden sync points") with an exact
shortest-augmenting-path solver on potentials that runs entirely inside jit.

Implementation: the classic O(K^2 * Q) Hungarian with row/column potentials
(K rows = padded GT slots, Q columns = queries, K <= Q). All inner scans are
vectorized over the Q columns; the sequential depth is K * (path length <= K+1),
small for detection workloads (K <= ~50). Tests verify exact agreement with
scipy on random instances.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_INF = 1e18


def hungarian(cost: Array, valid: Array) -> Array:
    """Exact min-cost assignment of rows to columns.

    cost: [K, Q] float; valid: [K] bool (invalid rows excluded).
    Returns [K] int32 column for each valid row (-1 for invalid rows).
    """
    k, q = cost.shape
    cost = jnp.where(valid[:, None], cost.astype(jnp.float32), 0.0)

    # p[j] = row matched to column j (-1 free); column index q is the virtual root.
    def add_row(carry, i):
        u, v, p = carry

        def do_row(u, v, p):
            p = p.at[q].set(i)
            minv = jnp.full((q,), _INF, cost.dtype)
            way = jnp.zeros((q,), jnp.int32)
            used = jnp.zeros((q + 1,), bool).at[q].set(True)

            def body(state):
                u, v, p, minv, way, used, j0 = state
                i0 = p[j0]
                cur = cost[i0] - u[i0] - v[:q]
                improve = (~used[:q]) & (cur < minv)
                minv = jnp.where(improve, cur, minv)
                way = jnp.where(improve, j0, way)
                masked = jnp.where(used[:q], _INF, minv)
                j1 = jnp.argmin(masked).astype(jnp.int32)
                delta = masked[j1]
                # update potentials
                u = u + jnp.where(
                    jnp.zeros((k,), bool).at[jnp.clip(p[:q], 0, k - 1)].max(
                        used[:q] & (p[:q] >= 0), mode="drop"
                    ),
                    delta,
                    0.0,
                )
                u = u.at[i].add(jnp.where(used[q], delta, 0.0))
                v = jnp.where(used[:q], v - delta, v)
                minv = jnp.where(used[:q], minv, minv - delta)
                used = used.at[j1].set(True)
                return u, v, p, minv, way, used, j1

            def cond(state):
                _, _, p, _, _, _, j0 = state
                return p[j0] != -1

            # first transition out of the virtual root
            state = (u, v, p, minv, way, used, jnp.asarray(q, jnp.int32))
            # run: while the current column is matched, keep growing the tree
            u, v, p, minv, way, used, j0 = jax.lax.while_loop(
                lambda s: s[2][s[6]] != -1, body, state
            )

            # augment: walk back along `way`, shifting matches
            def aug_body(state):
                p, j0 = state
                j1 = way[j0]
                p = p.at[j0].set(p[j1])
                return p, j1

            p, _ = jax.lax.while_loop(lambda s: s[1] != q, aug_body, (p, j0))
            return u, v, p

        u, v, p = jax.lax.cond(valid[i], do_row, lambda u, v, p: (u, v, p), u, v, p)
        return (u, v, p), None

    u0 = jnp.zeros((k,), cost.dtype)
    v0 = jnp.zeros((q,), cost.dtype)
    p0 = jnp.full((q + 1,), -1, jnp.int32)
    (_, _, p), _ = jax.lax.scan(add_row, (u0, v0, p0), jnp.arange(k))

    # invert: column for each row
    cols = jnp.arange(q, dtype=jnp.int32)
    row_of_col = p[:q]
    assignment = jnp.full((k,), -1, jnp.int32).at[
        jnp.clip(row_of_col, 0, k - 1)
    ].max(jnp.where(row_of_col >= 0, cols, -1), mode="drop")
    return jnp.where(valid, assignment, -1)


# drop-in name used by the model code
def auction_lap(cost: Array, valid: Array, **_ignored) -> Array:
    """Backwards-compatible alias (the auction was replaced by exact JV)."""
    return hungarian(cost, valid)


def hungarian_match(cost: Array, valid: Array, **kwargs) -> Tuple[Array, Array, Array]:
    """Returns (query_for_gt [K], selected_query [Q] bool, gt_for_query [Q] int)."""
    k, q = cost.shape
    assignment = hungarian(cost, valid)
    idx = jnp.where(assignment >= 0, assignment, q)  # unassigned scatter out of range
    sel = jnp.zeros((q,), bool).at[idx].set(True, mode="drop")
    gt_for_query = jnp.zeros((q,), jnp.int32).at[idx].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop"
    )
    return assignment, sel, gt_for_query
