"""Lookup argument (halo2-v0.3.0 style): permuted pairs + grand product.

Role of halo2's lookup prover (SURVEY.md section 2.13 item 3: "permuted
input/table columns built by sort, grand-product column Z").  The
reference backend sorts with rayon and walks rows sequentially; here the
permuted pair construction is argsort + searchsorted + a stable
compaction sort (all vectorized), and the product column is one
associative scan.

The *ordering* work happens on packed uint32 keys (every lookup in this
framework is over byte-ranged tuples, same encoding as the mock
checker); the *field* columns are then gathered by the resulting index
permutations, so soundness never depends on the packing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from halo2_aes_tpu.ops import field as F

FR = F.FR


def permuted_indices(packed_input, table_sorted, table_order, usable: int):
    """Index-level permuted pair construction over rows [0, usable).

    ``table_sorted``/``table_order``: the packed TABLE keys pre-sorted on
    host with their argsort — the table is fixed at layout time, so its
    sort never belongs inside the per-proof graph.

    Returns (input_perm, table_perm): int32[usable] row permutations such
    that A' = A[input_perm], S' = S[table_perm] satisfy the halo2 lookup
    constraints: A' sorted (grouped), S'[j] = A'[j] at each first
    occurrence, S' a permutation of the table column.
    """
    a_order = jnp.argsort(packed_input[:usable])
    a_sorted = jnp.take(packed_input, a_order)
    first = jnp.concatenate(
        [jnp.ones(1, bool), a_sorted[1:] != a_sorted[:-1]]
    )

    s_order = jnp.asarray(table_order)
    s_sorted = jnp.asarray(table_sorted)

    # one table slot per distinct input value (distinct values -> distinct slots)
    slots = jnp.searchsorted(s_sorted, a_sorted)
    used = jnp.zeros(usable, dtype=bool).at[
        jnp.where(first, slots, usable)
    ].set(True, mode="drop")

    # unused table rows, compacted in sorted-value order (stable sort)
    rem = jnp.take(s_order, jnp.argsort(used.astype(jnp.int32), stable=True))
    fill_rank = jnp.cumsum(~first) - 1
    table_perm = jnp.where(
        first,
        jnp.take(s_order, jnp.clip(slots, 0, usable - 1)),
        jnp.take(rem, jnp.clip(fill_rank, 0)),
    )
    return a_order, table_perm


def apply_permutation(field_col, perm, blinding):
    """Gather field rows by perm and append blinding tail -> (n, LIMBS)."""
    return jnp.concatenate([jnp.take(field_col, perm, axis=0), blinding], axis=0)


def grand_product(a, s, a_perm, s_perm, usable: int, beta_m, gamma_m, blinding):
    """z column: z[0]=1, z[j+1] = z[j] * (A+beta)(S+gamma) / ((A'+beta)(S'+gamma)).

    a, s: compressed input/table field columns (n, LIMBS);
    a_perm, s_perm: permuted field columns (n, LIMBS).
    Rows >= usable get `blinding` (the value at row `usable` — the full
    product, 1 on honest witnesses — is kept for the l_last constraint).
    """
    n = a.shape[0]
    one = jnp.asarray(FR.one_mont)
    num = F.mont_mul(FR, F.add(FR, a, beta_m), F.add(FR, s, gamma_m))
    den = F.mont_mul(FR, F.add(FR, a_perm, beta_m), F.add(FR, s_perm, gamma_m))
    den_inv = F.batch_inv(FR, den)
    ratio = F.mont_mul(FR, num, den_inv)
    active = jnp.arange(n) < usable
    ratio = F.select(active, ratio, jnp.broadcast_to(one, ratio.shape))
    cum = F.cumprod(FR, ratio)
    z = jnp.concatenate([one[None], cum[:-1]], axis=0)
    return jnp.concatenate([z[: n - blinding.shape[0]], blinding], axis=0)
