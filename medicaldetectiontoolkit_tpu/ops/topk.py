"""Top-k selection helpers tuned for TPU anchor counts.

``jax.lax.top_k`` lowers to a full stable sort on TPU — ~10 ms per call at 3D
anchor counts (674k), measured in the round-2 train-step trace. For the two
*stochastic* selections in the training path that cost is pure waste:

  * random positive subsampling in gt_anchor_matching (top-k of iid uniform
    keys — ANY k-subset filter of random keys is an unbiased random subset);
  * the SHEM negative pool (top ``poolsize * count`` by predicted fg score —
    the pool boundary is immaterial because the pool is then sampled
    uniformly anyway).

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
