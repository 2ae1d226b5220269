"""Distributed top-k merge over a data-sharded score vector.

Per-shard ``lax.top_k`` then an ``all_gather`` of the k-sized partials and a
final merge — k is small, so the collective moves O(ndev * k) elements over
ICI instead of the full score vector (SURVEY.md §5 distributed backend
plan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def topk_merge(scores: jnp.ndarray, indices: jnp.ndarray, k: int,
               mesh: Mesh, largest: bool = True):
    """Global top-k of a data-sharded ``scores`` (with global ``indices``).

    scores, indices: [C] sharded on ``data``. Returns (values[k], idx[k])
    replicated on every device.
    """
    sign = 1.0 if largest else -1.0
    ndev = mesh.shape["data"]
    shard_n = scores.shape[0] // ndev
    local_k = min(k, shard_n)
    k = min(k, shard_n * ndev)

    def local(scores_shard, idx_shard):
        v, pos = lax.top_k(sign * scores_shard.astype(jnp.float32), local_k)
        i = jnp.take(idx_shard, pos)
        # gather the per-shard candidates to every device
        v_all = lax.all_gather(v, "data", tiled=True)     # [ndev*local_k]
        i_all = lax.all_gather(i, "data", tiled=True)
        vg, posg = lax.top_k(v_all, k)
        return sign * vg, jnp.take(i_all, posg)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(scores, indices)
