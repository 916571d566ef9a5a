"""Fixed-shape Hungarian (min-cost bipartite) matching on device.

Behavioral parity target (reference, /root/reference):
* mmdet/core/bbox/assigners/hungarian_assigner.py:52-146 — DETR's
  query<->gt assignment. The reference ships the cost matrix to the host
  and calls scipy.optimize.linear_sum_assignment per image; here the
  classic O(n^3) potentials/augmenting-path algorithm runs entirely on
  device with static shapes (rows scanned by lax.scan, each augmenting
  search a lax.while_loop of dense O(C) vector relaxations), so matching
  stays inside the jitted train step — no host round-trip, vmappable
  over the batch and the decoder-layer axis.

Exactness: identical total cost to scipy (the assignment itself may
differ on cost ties, as between any two exact solvers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = np.float32(1e30)  # host scalar: a jnp constant here would init the backend at import


def _augment_row(i, row_valid_i, u, v, match_col, cost):
    """Grow the matching by one row via a shortest augmenting path.

    State: u [R] / v [C] dual potentials, match_col [C] int32 (row
    matched to each column, -1 = free). Classic Jonker-Volgenant style
    search: repeatedly relax slacks from the row tied to the most
    recently visited column, pick the cheapest unvisited column, update
    potentials, stop when a free column is reached; then flip the
    alternating path encoded in `way`.
    """
    C = cost.shape[1]
    R = cost.shape[0]

    def search_cond(st):
        _, _, _, _, _, j0, steps = st
        keep = jnp.where(j0 < 0, True, match_col[j0] >= 0)
        return keep & (steps <= C)

    def search_body(st):
        u, v, minv, way, used, j0, steps = st
        i0 = jnp.where(j0 < 0, i, match_col[j0])
        slack = cost[i0] - u[i0] - v  # [C]
        upd = (~used) & (slack < minv)
        minv = jnp.where(upd, slack, minv)
        way = jnp.where(upd, j0, way)
        masked = jnp.where(used, _INF, minv)
        j1 = jnp.argmin(masked).astype(jnp.int32)
        delta = masked[j1]
        # dual update: visited rows (incl. i) +delta, visited cols -delta,
        # unvisited slacks shrink by delta
        row_idx = jnp.where(used, match_col, R)  # R = out-of-range, dropped
        u = u.at[row_idx].add(jnp.where(used, delta, 0.0), mode="drop")
        u = u.at[i].add(delta)
        v = v - jnp.where(used, delta, 0.0)
        minv = minv - jnp.where(used, 0.0, delta)
        used = used.at[j1].set(True)
        return u, v, minv, way, used, j1, steps + 1

    minv0 = jnp.full((C,), _INF)
    way0 = jnp.full((C,), -1, jnp.int32)
    used0 = jnp.zeros((C,), bool)
    u, v, minv, way, used, j_end, _ = jax.lax.while_loop(
        search_cond, search_body,
        (u, v, minv0, way0, used0, jnp.int32(-1), jnp.int32(0)))

    # unwind the alternating path: each visited column takes the row of
    # its predecessor; the path root takes row i
    def flip_cond(st):
        _, j = st
        return j >= 0

    def flip_body(st):
        mc, j = st
        jprev = way[j]
        row = jnp.where(jprev < 0, i, mc[jprev])
        return mc.at[j].set(row), jprev

    match_col, _ = jax.lax.while_loop(flip_cond, flip_body, (match_col, j_end))
    return u, v, match_col


def hungarian_match(cost: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost assignment of rows (gts) to columns (queries).

    cost: [R, C] float32 with R <= C; row_valid: [R] bool (padded gt rows
    are skipped). Returns col_of_row: [R] int32, the matched column per
    valid row (arbitrary value for invalid rows — mask downstream).
    """
    R, C = cost.shape
    if R > C:
        raise ValueError(f"hungarian_match needs rows <= cols, got {R}x{C}")
    cost = cost.astype(jnp.float32)

    def scan_body(carry, i):
        u, v, match_col = carry

        def do(args):
            u, v, mc = args
            return _augment_row(i, True, u, v, mc, cost)

        u, v, match_col = jax.lax.cond(
            row_valid[i], do, lambda a: a, (u, v, match_col))
        return (u, v, match_col), None

    u0 = jnp.zeros((R,), jnp.float32)
    v0 = jnp.zeros((C,), jnp.float32)
    mc0 = jnp.full((C,), -1, jnp.int32)
    (_, _, match_col), _ = jax.lax.scan(
        scan_body, (u0, v0, mc0), jnp.arange(R, dtype=jnp.int32))

    # invert: col_of_row[r] = the unique c with match_col[c] == r
    hits = match_col[None, :] == jnp.arange(R, dtype=jnp.int32)[:, None]  # [R, C]
    col_of_row = jnp.argmax(hits, axis=1).astype(jnp.int32)
    return col_of_row
