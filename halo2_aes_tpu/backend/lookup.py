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


def permuted_indices_field(a_std, s_std, usable: int):
    """Permuted pair construction ordered by CANONICAL FIELD VALUE —
    halo2's permuted-pair ordering (lookup::permute_expression_pair
    sorts the theta-compressed scalars via their canonical repr;
    halo2curves Fr's Ord compares canonical integers).

    ``a_std``, ``s_std``: (usable, LIMBS) STANDARD-form (non-Montgomery)
    limbs of the compressed input / table columns.  Unlike the packed
    path, the table order depends on theta, so everything sorts on
    device inside the proof's jit.

    Returns (a_order, table_perm) int32[usable] row permutations with
    the same contract as ``permuted_indices``.
    """
    u = usable
    HI = 2 * u          # out-of-range sentinel for scatter-min/drop

    def keys(x):
        x = x.astype(jnp.uint32)
        return [(x[:, 2 * j + 1] << 16) | x[:, 2 * j] for j in range(8)]

    comb = [jnp.concatenate([a, s])
            for a, s in zip(keys(a_std[:u]), keys(s_std[:u]))]
    # LSD radix over the 8 u32 key words via stable argsorts ->
    # combined order by canonical integer value
    order = jnp.argsort(comb[0], stable=True)
    for j in range(1, 8):
        order = jnp.take(order,
                         jnp.argsort(jnp.take(comb[j], order), stable=True))
    sk = [jnp.take(c, order) for c in comb]
    is_input = jnp.take(jnp.arange(2 * u) < u, order)
    neq = sk[0][1:] != sk[0][:-1]
    for j in range(1, 8):
        neq = neq | (sk[j][1:] != sk[j][:-1])
    group_start = jnp.concatenate([jnp.ones(1, bool), neq])
    gid = jnp.cumsum(group_start) - 1                      # (2u,)
    pos = jnp.arange(2 * u)

    # input subsequence in sorted order -> a_order (original input rows)
    rank_in = jnp.cumsum(is_input) - 1
    a_order = jnp.zeros(u, jnp.int32).at[
        jnp.where(is_input, rank_in, HI)
    ].set(order.astype(jnp.int32), mode="drop")

    # per group: first input position and first table position
    first_in_pos = jnp.full(2 * u, HI, jnp.int32).at[gid].min(
        jnp.where(is_input, pos, HI).astype(jnp.int32))
    first_tab_pos = jnp.full(2 * u, HI, jnp.int32).at[gid].min(
        jnp.where(is_input, HI, pos).astype(jnp.int32))
    first_flag = is_input & (pos == jnp.take(first_in_pos, gid))
    # original table row of each group's first table entry (garbage when
    # a dishonest input value has no table match — the argument rejects)
    safe_tab_pos = jnp.clip(jnp.take(first_tab_pos, gid), 0, 2 * u - 1)
    match_row = jnp.clip(jnp.take(order, safe_tab_pos) - u, 0, u - 1)

    # scatter to input-rank space
    firstA = jnp.zeros(u, bool).at[
        jnp.where(is_input, rank_in, HI)].set(first_flag, mode="drop")
    matchA = jnp.zeros(u, jnp.int32).at[
        jnp.where(is_input, rank_in, HI)
    ].set(match_row.astype(jnp.int32), mode="drop")

    # unused table rows, compacted in sorted-value order
    used = jnp.zeros(u, bool).at[
        jnp.where(first_flag, match_row, HI)].set(True, mode="drop")
    rank_tab = jnp.cumsum(~is_input) - 1
    s_order = jnp.zeros(u, jnp.int32).at[
        jnp.where(is_input, HI, rank_tab)
    ].set((order - u).astype(jnp.int32), mode="drop")
    rem = jnp.take(
        s_order,
        jnp.argsort(jnp.take(used, s_order).astype(jnp.int32), stable=True))
    fill_rank = jnp.cumsum(~firstA) - 1
    table_perm = jnp.where(firstA, matchA,
                           jnp.take(rem, jnp.clip(fill_rank, 0)))
    return a_order, table_perm


def permuted_indices_field_many(a_std, s_std, L: int, usable: int):
    """Batched ``permuted_indices_field`` over L lookups at once.

    ``a_std``/``s_std``: FLAT (L*usable, LIMBS) standard-form limbs
    (lookup l's rows at [l*usable, (l+1)*usable)).  Returns
    (a_order, table_perm) as (L, usable) int32 — identical per lookup
    to the single-lookup builder (regression-tested), but every radix
    pass is ONE batched sort across all lookups instead of L separate
    sort chains (the lookup phase dispatched L*8 stable argsorts; at
    n_sets=4 that serialized to ~12 s of the prove)."""
    u = usable
    M = 2 * u
    HI = jnp.int32(M)            # out-of-range sentinel (per-row space)

    def words(x):
        x = x.astype(jnp.uint32)
        return [(x[:, 2 * j + 1] << 16) | x[:, 2 * j] for j in range(8)]

    # (L, 2u) per radix word: [input rows | table rows] per lookup
    comb = [jnp.concatenate([a.reshape(L, u), s.reshape(L, u)], axis=1)
            for a, s in zip(words(a_std), words(s_std))]
    order = jnp.argsort(comb[0], axis=1, stable=True)
    for j in range(1, 8):
        order = jnp.take_along_axis(
            order,
            jnp.argsort(jnp.take_along_axis(comb[j], order, axis=1),
                        axis=1, stable=True),
            axis=1)
    sk = [jnp.take_along_axis(c, order, axis=1) for c in comb]
    is_input = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(M)[None, :] < u, (L, M)), order, axis=1)
    neq = sk[0][:, 1:] != sk[0][:, :-1]
    for j in range(1, 8):
        neq = neq | (sk[j][:, 1:] != sk[j][:, :-1])
    group_start = jnp.concatenate(
        [jnp.ones((L, 1), bool), neq], axis=1)
    gid = jnp.cumsum(group_start, axis=1) - 1              # (L, 2u)
    pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (L, M))

    # flat scatter offsets (per-row spaces packed back to back)
    row2 = (jnp.arange(L, dtype=jnp.int32) * M)[:, None]   # (L,1)
    rowu = (jnp.arange(L, dtype=jnp.int32) * u)[:, None]
    drop_u = jnp.int32(L * u)

    rank_in = jnp.cumsum(is_input, axis=1) - 1
    a_order = jnp.zeros(L * u, jnp.int32).at[
        jnp.where(is_input, rank_in + rowu, drop_u).reshape(-1)
    ].set(order.astype(jnp.int32).reshape(-1), mode="drop").reshape(L, u)

    gid_flat = (gid + row2).reshape(-1)
    first_in_pos = jnp.full(L * M, HI, jnp.int32).at[gid_flat].min(
        jnp.where(is_input, pos, HI).reshape(-1)).reshape(L, M)[
        jnp.arange(L)[:, None], jnp.minimum(gid, M - 1)]
    first_tab_pos = jnp.full(L * M, HI, jnp.int32).at[gid_flat].min(
        jnp.where(is_input, HI, pos).reshape(-1)).reshape(L, M)[
        jnp.arange(L)[:, None], jnp.minimum(gid, M - 1)]
    first_flag = is_input & (pos == first_in_pos)
    safe_tab_pos = jnp.clip(first_tab_pos, 0, M - 1)
    match_row = jnp.clip(
        jnp.take_along_axis(order, safe_tab_pos, axis=1) - u, 0, u - 1)

    firstA = jnp.zeros(L * u, bool).at[
        jnp.where(is_input, rank_in + rowu, drop_u).reshape(-1)
    ].set(first_flag.reshape(-1), mode="drop").reshape(L, u)
    matchA = jnp.zeros(L * u, jnp.int32).at[
        jnp.where(is_input, rank_in + rowu, drop_u).reshape(-1)
    ].set(match_row.astype(jnp.int32).reshape(-1),
          mode="drop").reshape(L, u)

    used = jnp.zeros(L * u, bool).at[
        jnp.where(first_flag, match_row + rowu, drop_u).reshape(-1)
    ].set(True, mode="drop").reshape(L, u)
    rank_tab = jnp.cumsum(~is_input, axis=1) - 1
    s_order = jnp.zeros(L * u, jnp.int32).at[
        jnp.where(is_input, drop_u, rank_tab + rowu).reshape(-1)
    ].set((order - u).astype(jnp.int32).reshape(-1),
          mode="drop").reshape(L, u)
    rem = jnp.take_along_axis(
        s_order,
        jnp.argsort(jnp.take_along_axis(used, s_order, axis=1)
                    .astype(jnp.int32), axis=1, stable=True),
        axis=1)
    fill_rank = jnp.cumsum(~firstA, axis=1) - 1
    table_perm = jnp.where(
        firstA, matchA,
        jnp.take_along_axis(rem, jnp.clip(fill_rank, 0), axis=1))
    return a_order, table_perm


def apply_permutation(field_col, perm, blinding):
    """Gather field rows by perm and append blinding tail -> (n, LIMBS)."""
    return jnp.concatenate([jnp.take(field_col, perm, axis=0), blinding], axis=0)


def grand_product_many(a, s, a_perm, s_perm, L: int, usable: int,
                       beta_m, gamma_m, blinding):
    """All L lookups' z columns in one pass over FLAT (L*n, 16) tensors
    (lookup l at rows [l*n, (l+1)*n)); blinding (L, blind_rows, 16).

    Identical math to per-lookup ``grand_product`` (regression-tested)
    but ONE batched inversion (one Fermat chain instead of L) and ONE
    flag-segmented scan (log(L*n) combine rounds instead of L separate
    scan chains) — the per-lookup loop's launch latency dominated the
    product phase at n_sets=4."""
    m = a.shape[0]
    n = m // L
    bf = blinding.shape[1]
    one = jnp.asarray(FR.one_mont)
    num = F.mont_mul(FR, F.add(FR, a, beta_m), F.add(FR, s, gamma_m))
    den = F.mont_mul(FR, F.add(FR, a_perm, beta_m),
                     F.add(FR, s_perm, gamma_m))
    ratio = F.mont_mul(FR, num, F.batch_inv(FR, den))
    offs = jnp.arange(m) % n
    ratio = F.select(offs < usable, ratio,
                     jnp.broadcast_to(one, ratio.shape))
    cum = F.cumprod_segmented(FR, ratio, n)
    # z[seg][0] = 1, z[seg][j] = cum[seg][j-1]
    z = jnp.concatenate([one[None], cum[:-1]], axis=0)
    z = F.select(offs == 0, jnp.broadcast_to(one, z.shape), z)
    tail_idx = (jnp.arange(L)[:, None] * n
                + (n - bf) + jnp.arange(bf)[None, :]).reshape(-1)
    return z.at[tail_idx].set(blinding.reshape(L * bf, F.LIMBS))


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
