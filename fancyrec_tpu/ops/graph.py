"""Graph ops: GCN adjacency normalization (reference util/util.py:10-14).

Dead code in the reference (zero importers); ported for inventory
completeness as a plain jnp op.
"""

from __future__ import annotations

import jax.numpy as jnp


def gen_adj(a):
    """Symmetrically normalized adjacency: D^-1/2 A^T D^-1/2 with
    D = diag(rowsum(A)). Note the reference transposes A *after* the
    right-multiplication, so the result is (A D)^T D = D A^T D --
    faithfully kept."""
    a = jnp.asarray(a, jnp.float32)
    d = jnp.power(jnp.sum(a, axis=1), -0.5)
    dm = jnp.diag(d)
    return jnp.matmul(jnp.matmul(a, dm).T, dm)
