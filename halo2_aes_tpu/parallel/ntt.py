"""Multi-device NTT via the four-step (Bailey) decomposition.

The reference's backend runs best_fft on rayon threads in shared memory
(SURVEY.md section 2.13); the multi-device scaling axis here is rows
(SURVEY.md section 5.7).  A length-n transform is decomposed as an
(n1 x n2) matrix:

  1. column NTTs of size n1   — local when the matrix is sharded by column,
  2. twiddle scaling w^(j2*k1) — elementwise, stays sharded,
  3. reshard columns->rows     — the one collective (XLA lowers the
     sharding-constraint change to an all-to-all over ICI),
  4. row NTTs of size n2       — local when sharded by row,
  5. transpose + flatten       — output in natural order.

Derivation: with j = j1*n2 + j2, k = k2*n1 + k1,
  X[k2*n1+k1] = sum_{j2} w_{n2}^{j2 k2} ( w^{j2 k1} sum_{j1} w_{n1}^{j1 k1} x[j1*n2+j2] ).

The same decomposition with w^-1 and the sub-NTTs' 1/n1, 1/n2 scalings
gives the inverse transform (1/n total).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from halo2_aes_tpu.ops import field as F
from halo2_aes_tpu.ops.ntt import Domain, domain, ntt  # noqa: F401 (re-export)


def _twiddle_matrix(dom: Domain, n1: int, n2: int, inverse: bool):
    """(n1, n2, LIMBS) table of w^(k1*j2) gathered from the full power table."""
    full = dom.omega_powers(dom.n, inverse=inverse)
    k1 = jnp.arange(n1, dtype=jnp.int32)[:, None]
    j2 = jnp.arange(n2, dtype=jnp.int32)[None, :]
    return jnp.take(full, k1 * j2, axis=0)


_FN_CACHE: dict = {}


def _sharded_fn(mesh, axis: str, dom: Domain, inverse: bool, count: int,
                with_shift: bool):
    """Compiled BATCHED four-step transform, CACHED per (mesh, axis,
    domain, direction, batch count, shift?) — building a fresh jit per
    call would recompile every time (tens of seconds on this host).

    The batch dimension is handled INSIDE the one compiled body (vmapped
    sub-NTTs over count*rows), so a caller transforming 10 polys traces
    ONE four-step lattice instead of inlining 10 — the per-poly variant
    made every prover phase's mesh graph ~count× bigger, which is what
    blew the round-2 multichip dryrun past the driver budget."""
    key = (mesh, axis, dom.spec, dom.k, inverse, count, with_shift)
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    spec = dom.spec
    k = dom.k
    k1 = k // 2
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    dom1 = domain(spec, k1)
    dom2 = domain(spec, k2)

    by_col = NamedSharding(mesh, P(None, None, axis, None))
    by_row = NamedSharding(mesh, P(None, axis, None, None))
    flat = NamedSharding(mesh, P(axis, None))

    # sub-NTTs vmapped over (count, other-axis): ONE traced body each
    col_ntt = jax.vmap(
        jax.vmap(lambda c: ntt(dom1, c, inverse=inverse),
                 in_axes=1, out_axes=1))
    row_ntt = jax.vmap(
        jax.vmap(lambda r: ntt(dom2, r, inverse=inverse),
                 in_axes=0, out_axes=0))

    # the LOCAL stages run under shard_map: each device transforms its
    # own (count, n1, n2/D) / (count, n1/D, n2) block with ordinary
    # single-device NTT bodies, so the SPMD partitioner never has to
    # guess shardings for the butterfly gathers — the r4 dryrun logged
    # "[SPMD] Involuntary full rematerialization" on exactly those
    # gathers (it replicated the tensor as a last resort).  The one
    # collective left is the explicit by_col -> by_row reshard (XLA
    # lowers it to an all-to-all over ICI).
    # check_vma=False: the compact field kernels' fori_loop carries mix
    # unvarying twiddle constants with device-varying data, which the
    # replication checker rejects; the specs above are authoritative.
    stage1 = jax.shard_map(
        lambda a_blk, tw_blk: F.mont_mul(spec, col_ntt(a_blk),
                                         tw_blk[None]),
        mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, axis, None)),
        out_specs=P(None, None, axis, None), check_vma=False)
    stage2 = jax.shard_map(
        row_ntt, mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=P(None, axis, None, None), check_vma=False)

    @functools.partial(jax.jit, out_shardings=flat)
    def run(x, shift_pows):
        if with_shift:
            x = F.mont_mul(spec, x, jnp.tile(shift_pows, (count, 1)))
        tw = _twiddle_matrix(dom, n1, n2, inverse)
        a = jax.lax.with_sharding_constraint(
            x.reshape(count, n1, n2, F.LIMBS), by_col)
        b = stage1(a, tw)
        c = jax.lax.with_sharding_constraint(b, by_row)   # the all-to-all
        d = stage2(c)
        return jnp.swapaxes(d, 1, 2).reshape(count * dom.n, F.LIMBS)

    _FN_CACHE[key] = run
    return run


def ntt_sharded_many(mesh, axis: str, dom: Domain, flat, count: int,
                     inverse: bool = False, shift_pows=None):
    """Distributed NTT of ``count`` stacked polys (FLAT (count*n, LIMBS),
    poly i at rows [i*n, (i+1)*n)) over one mesh axis; optional coset
    shift-power pre-scaling folded into the same executable.

    Works on any mesh (including a single device); the sub-transform
    sizes are k//2 and k - k//2, so the all-to-all moves each element
    exactly once."""
    fn = _sharded_fn(mesh, axis, dom, inverse, count, shift_pows is not None)
    if shift_pows is None:
        shift_pows = jnp.zeros((0, F.LIMBS), jnp.uint32)
    with mesh:
        return fn(flat, shift_pows)


def ntt_sharded(mesh, axis: str, dom: Domain, x, inverse: bool = False):
    """Distributed NTT of one poly x (n, LIMBS) over one mesh axis."""
    return ntt_sharded_many(mesh, axis, dom, x, 1, inverse=inverse)
