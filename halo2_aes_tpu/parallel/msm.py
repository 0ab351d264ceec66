"""Multi-device MSM: point- AND table-sharded Pippenger with a
collective reduce.

SURVEY.md section 5.8: "MSM points shard by index with collective
bucket-sum".  Each device runs the full windowed bucket MSM on its point
slice — INCLUDING its slice of the SRS's 2^{cw}-shifted window tables,
so the sharded path keeps the single-device optimization that removed
the sequential Horner doubling tail (the round-2 version dropped the
tables and paid that tail on every sharded commitment).  The per-device
partial sums (one projective point each) are all-gathered and tree-added
identically on every device — D−1 extra point adds total, negligible
next to the local work, and the result is replicated for the host
transcript read.

The compiled sharded callable is CACHED per (mesh, axis, window,
tables?): a fresh shard_map closure per call would recompile (~1 min on
this host) for every single commitment.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops import msm as M

_CACHE: dict = {}


def _sharded_fn(mesh: Mesh, axis: str, c, with_tables: bool):
    key = (mesh, axis, c, with_tables)
    if key not in _CACHE:
        specs = (P(axis, None), P(axis, None), P(axis, None))
        if with_tables:
            specs += (P(None, axis, None),)   # (W, n, 32) sharded by index

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=specs,
            out_specs=(P(), P(), P()),
            # the fori_loop carries inside mont_mul start replicated and
            # become device-varying; skip the strict vma check
            check_vma=False,
        )
        def run(px, py, s, *t):
            tables = t[0].reshape(-1, 2 * F.LIMBS) if with_tables else None
            part = M.msm((px, py), s, c=c, tables=tables)
            gathered = tuple(
                jax.lax.all_gather(coord, axis, tiled=False) for coord in part
            )
            return M._tree_add(gathered)

        _CACHE[key] = jax.jit(run)
    return _CACHE[key]


def msm_sharded(mesh: Mesh, axis: str, points, scalars, c: int | None = None,
                tables=None):
    """points: (x, y) each (n, 16); scalars (n, 16) plain; n divisible by
    the axis size.  ``tables``: optional (W*n, 32) build_tables output
    (the SRS window tables); sharded by point index alongside the
    points, it removes every device's Horner doubling tail.  ``c`` must
    be the window the tables were built with (required when ``tables``
    is given; the per-shard default would differ from the full-size
    one).  Returns a replicated projective point."""
    px, py = points
    if tables is not None:
        assert c is not None, "explicit window required with tables"
        n = px.shape[0]
        t3 = tables.reshape(-1, n, 2 * F.LIMBS)
        return _sharded_fn(mesh, axis, c, True)(px, py, scalars, t3)
    return _sharded_fn(mesh, axis, c, False)(px, py, scalars)
