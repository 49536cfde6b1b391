"""Top-k selection helpers tuned for TPU anchor counts.

``jax.lax.top_k`` lowers to a full stable sort on TPU — ~10 ms per call at 3D
anchor counts (674k), measured in the round-2 train-step trace. For selections
whose exact membership is immaterial that cost is pure waste:

  * the SHEM negative pool (top ``poolsize * count`` by predicted fg score —
    the pool is subsequently sampled uniformly, so the approximate pool
    boundary only blurs WHICH near-boundary hard negatives are eligible);
  * monitoring-only index compaction (models/base.compact_anchor_indices).

CAUTION — approx_max_k reduces positionally-binned chunks and keeps one max
per bin, so values that CLUSTER in index space collapse to one survivor.
That makes it WRONG for: random positive subsampling (positive anchors
cluster around objects; colliding positives would be dropped, not
subsampled) and detection refinement (per-anchor class scores are adjacent
in the flat index; a collision drops the weaker class's candidate before
per-class NMS). Those sites use exact ``lax.top_k``.

``stochastic_top_k`` therefore dispatches to ``jax.lax.approx_max_k``
(TPU-native partial-reduction top-k, no full sort) for large inputs, keeping
exact ``lax.top_k`` for small ones (test-sized arrays stay bit-exact with the
oracle semantics). Deterministic selections (proposal top-k, detection
refinement) keep exact ``lax.top_k``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# below this size a full sort is cheap and exactness is free
_APPROX_MIN_SIZE = 65536


def stochastic_top_k(scores, k: int, recall_target: float = 0.95):
    """Top-k for stochastic selections: approx on large inputs, exact on small.

    Returns (values, indices) like ``jax.lax.top_k``.
    """
    n = scores.shape[-1]
    if n >= _APPROX_MIN_SIZE and k < n:
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return jax.lax.top_k(scores, k)
