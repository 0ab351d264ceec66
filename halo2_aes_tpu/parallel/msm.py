"""Multi-device MSM: point-sharded Pippenger with a collective reduce.

SURVEY.md section 5.8: "MSM points shard by index with collective
bucket-sum".  Each device runs the full windowed bucket MSM on its point
slice (ops/msm.py); the per-device partial sums (one projective point
each) are all-gathered and tree-added identically on every device —
D-1 extra point adds total, negligible next to the local work, and the
result is replicated for the host transcript read.

The compiled sharded callable is CACHED per (mesh, axis, window): a
fresh shard_map closure per call would recompile (~1 min on this host)
for every single commitment.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from halo2_aes_tpu.ops import msm as M

_CACHE: dict = {}


def _sharded_fn(mesh: Mesh, axis: str, c):
    key = (mesh, axis, c)
    if key not in _CACHE:
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None)),
            out_specs=(P(None), P(None), P(None)),
            # the fori_loop carries inside mont_mul start replicated and
            # become device-varying; skip the strict vma check
            check_rep=False,
        )
        def run(px, py, s):
            part = M.msm((px, py), s, c=c)
            gathered = tuple(
                jax.lax.all_gather(coord, axis, tiled=False) for coord in part
            )
            return M._tree_add(gathered)

        _CACHE[key] = jax.jit(run)
    return _CACHE[key]


def msm_sharded(mesh: Mesh, axis: str, points, scalars, c: int | None = None):
    """points: (x, y) each (n, 16); scalars (n, 16) plain; n divisible by
    the axis size.  Returns a replicated projective point."""
    px, py = points
    return _sharded_fn(mesh, axis, c)(px, py, scalars)
