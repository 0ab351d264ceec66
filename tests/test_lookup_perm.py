"""Direct unit tests for the permuted-pair index construction.

ADVICE r4: ``permuted_indices_field`` is the default lookup ordering for
every prove but was only exercised indirectly through prove/verify
round trips.  These tests compare both index builders against a naive
host-side reference on random AND degenerate vectors (all-equal inputs,
duplicate table values, boundary values), asserting:

  * ``a_order`` and ``table_perm`` are permutations of [0, usable),
  * A' = A[a_order] is grouped (non-decreasing by the sort key),
  * the halo2 run constraint holds: at every row j either
    S'[j] == A'[j] (first occurrence) or A'[j] == A'[j-1]
    (halo2 v0.3.0 lookup::permute_expression_pair contract).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_aes_tpu.backend import lookup as LK
from halo2_aes_tpu.ops import field as F

FR = F.FR


def _check_contract(a_vals, s_vals, a_order, table_perm):
    """Naive reference check over python ints."""
    u = len(a_vals)
    a_order = [int(v) for v in np.asarray(a_order)]
    table_perm = [int(v) for v in np.asarray(table_perm)]
    assert sorted(a_order) == list(range(u)), "a_order not a permutation"
    assert sorted(table_perm) == list(range(u)), (
        "table_perm not a permutation")
    a_sorted = [a_vals[i] for i in a_order]
    assert a_sorted == sorted(a_sorted), "A' not grouped/sorted"
    for j in range(u):
        sv = s_vals[table_perm[j]]
        if j == 0 or a_sorted[j] != a_sorted[j - 1]:
            assert sv == a_sorted[j], (
                f"first occurrence at row {j}: S'={sv} != A'={a_sorted[j]}")
        # repeated rows are unconstrained (filled from unused table rows)


def _field_case(a_ints, s_ints):
    u = len(a_ints)
    a_std = jnp.asarray(F.ints_to_limbs_fast(a_ints))
    s_std = jnp.asarray(F.ints_to_limbs_fast(s_ints))
    a_order, table_perm = LK.permuted_indices_field(a_std, s_std, u)
    _check_contract(a_ints, s_ints, a_order, table_perm)


def test_field_random_with_duplicates():
    rng = np.random.default_rng(7)
    u = 256
    # duplicate table values AND inputs sampled from the table
    pool = [int.from_bytes(rng.bytes(32), "little") % FR.modulus
            for _ in range(40)]
    s_ints = [pool[int(rng.integers(0, len(pool)))] for _ in range(u)]
    a_ints = [s_ints[int(rng.integers(0, u))] for _ in range(u)]
    _field_case(a_ints, s_ints)


def test_field_high_limb_collisions():
    # values that differ ONLY in the top radix words — catches a sort
    # that drops the high key words
    base = (1 << 250)
    u = 64
    s_ints = [(base + (i % 8) * (1 << 248)) % FR.modulus for i in range(u)]
    a_ints = [s_ints[(i * 5) % u] for i in range(u)]
    _field_case(a_ints, s_ints)


def test_field_all_equal_inputs():
    u = 32
    s_ints = [(i * 977) % FR.modulus for i in range(u)]
    a_ints = [s_ints[11]] * u
    _field_case(a_ints, s_ints)


def test_field_all_equal_table():
    u = 16
    s_ints = [42] * u
    a_ints = [42] * u
    _field_case(a_ints, s_ints)


def test_field_boundary_values():
    # extreme canonical values incl. 0 and r-1 at the usable boundary
    u = 16
    s_ints = [0, FR.modulus - 1] * (u // 2)
    a_ints = [FR.modulus - 1] * (u - 1) + [0]
    _field_case(a_ints, s_ints)


def test_packed_random_and_degenerate():
    rng = np.random.default_rng(3)
    u = 256
    for case in ("random", "all_equal"):
        if case == "random":
            s_np = rng.integers(0, 1 << 16, u, dtype=np.uint32)
            a_np = s_np[rng.integers(0, u, u)]
        else:
            s_np = np.full(u, 7, dtype=np.uint32)
            a_np = np.full(u, 7, dtype=np.uint32)
        order = np.argsort(s_np, kind="stable").astype(np.int32)
        a_order, table_perm = LK.permuted_indices(
            jnp.asarray(a_np), jnp.asarray(s_np[order]),
            jnp.asarray(order), u)
        _check_contract([int(v) for v in a_np], [int(v) for v in s_np],
                        a_order, table_perm)


def test_field_many_matches_single():
    """The batched radix construction must be index-identical per
    lookup to the single-lookup builder (it replaced the per-lookup
    sort chain in the prover's lookup phase)."""
    rng = np.random.default_rng(13)
    u, L = 64, 5
    a_int, s_int = [], []
    for l in range(L):
        pool = [int.from_bytes(rng.bytes(32), "little") % FR.modulus
                for _ in range(10 + l)]
        s_l = [pool[int(rng.integers(0, len(pool)))] for _ in range(u)]
        a_l = [s_l[int(rng.integers(0, u))] for _ in range(u)]
        s_int.append(s_l)
        a_int.append(a_l)
    # degenerate lookup in the batch: all-equal values
    a_int[2] = [a_int[2][0]] * u
    s_int[2] = [a_int[2][0]] * u
    a_std = jnp.asarray(F.ints_to_limbs_fast(sum(a_int, [])))
    s_std = jnp.asarray(F.ints_to_limbs_fast(sum(s_int, [])))
    a_ord_b, t_perm_b = LK.permuted_indices_field_many(a_std, s_std, L, u)
    for l in range(L):
        a_ord_1, t_perm_1 = LK.permuted_indices_field(
            a_std[l * u : (l + 1) * u], s_std[l * u : (l + 1) * u], u)
        np.testing.assert_array_equal(np.asarray(a_ord_b[l]),
                                      np.asarray(a_ord_1))
        np.testing.assert_array_equal(np.asarray(t_perm_b[l]),
                                      np.asarray(t_perm_1))
        _check_contract(a_int[l], s_int[l], a_ord_b[l], t_perm_b[l])


def test_grand_product_many_matches_single():
    """grand_product_many (one batched inversion + one flag-segmented
    scan) must be value-identical to the per-lookup grand_product loop
    it replaced in the product phase."""
    rng = np.random.default_rng(17)
    n, u, L, bf = 32, 26, 3, 5

    def rnd(rows):
        return jnp.asarray(FR.encode(
            [int(v) for v in rng.integers(1, 2**61, rows)]))

    a, s = rnd(L * n), rnd(L * n)
    ap, sp = rnd(L * n), rnd(L * n)
    beta, gamma = (jnp.asarray(FR.encode(v)) for v in (7, 11))
    blinds = rnd(L * bf).reshape(L, bf, F.LIMBS)
    batched = LK.grand_product_many(a, s, ap, sp, L, u, beta, gamma,
                                    blinds)
    for l in range(L):
        sl = slice(l * n, (l + 1) * n)
        single = LK.grand_product(a[sl], s[sl], ap[sl], sp[sl], u,
                                  beta, gamma, blinds[l])
        np.testing.assert_array_equal(np.asarray(batched[sl]),
                                      np.asarray(single))


@pytest.mark.parametrize("seed", [0, 1])
def test_field_matches_packed_grouping(seed):
    """On byte-tuple-ranged data both orderings satisfy the same
    contract (proof bytes differ; the argument accepts either)."""
    rng = np.random.default_rng(seed)
    u = 128
    s_np = rng.integers(0, 256, u, dtype=np.uint32)
    a_np = s_np[rng.integers(0, u, u)]
    _field_case([int(v) for v in a_np], [int(v) for v in s_np])
