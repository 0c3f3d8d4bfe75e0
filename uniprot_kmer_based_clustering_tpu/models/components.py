"""Connected-component clustering over the thresholded pair graph.

The reference never reaches a cluster assignment in its live path — the
Debug dump of merged edges (src/main.rs:235) leaves clustering implicit in
the pair graph. The natural cluster structure of that output is the
connected components of the surviving pairs; this module provides it both
as a host union-find (exact, tiny input) and as a device min-label
propagation (for very large pair lists, deterministic and jit-compiled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def connected_components(n: int, pairs: np.ndarray) -> np.ndarray:
    """Host union-find. `pairs` is int [M, >=2] of (i, j, ...) edges.

    Returns int32 [n] labels where each component's label is its smallest
    member index — deterministic regardless of edge order.
    """
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for i, j in np.asarray(pairs)[:, :2]:
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            if ri < rj:
                parent[rj] = ri
            else:
                parent[ri] = rj
    labels = np.array([find(i) for i in range(n)], dtype=np.int32)
    return labels


@functools.partial(jax.jit, static_argnames=("n",))
def connected_components_device(pairs_i, pairs_j, *, n: int):
    """Device min-label propagation (pointer jumping).

    Iterates label[i] = min over neighbors until fixpoint; converges in
    O(log n) doublings thanks to the path-halving step. Deterministic
    (min-reduction is order-free). Pads are ignored by passing i=j for
    padding edges.
    """
    labels = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        labels, _ = state
        li = labels[pairs_i]
        lj = labels[pairs_j]
        m = jnp.minimum(li, lj)
        new = labels.at[pairs_i].min(m)
        new = new.at[pairs_j].min(m)
        # pointer halving: label[i] ← label[label[i]]
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return labels
