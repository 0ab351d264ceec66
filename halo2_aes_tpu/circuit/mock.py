"""Vectorized satisfiability checker — the MockProver equivalent.

Where halo2's MockProver walks every row of every constraint in Rust
loops (reference src/aes128.rs:417-418 usage; SURVEY.md section 3.2),
this evaluates:
  * every gate as one vectorized int32 polynomial over all rows,
  * every lookup as packed-key membership (sort + searchsorted),
  * every copy constraint as one gather-compare,
all on device.

int32 is exact here by construction: all circuit values are < 2^16 and
expression degree <= 2 with 0/1 selectors, so no intermediate exceeds
int32 range (asserted).  Failure reports carry constraint names and the
first failing rows, matching MockProver's dev ergonomics.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

import jax.numpy as jnp
import numpy as np

from halo2_aes_tpu.circuit.ir import CompiledCircuit


class Int32Algebra:
    @staticmethod
    def const(v: int):
        assert 0 <= v < (1 << 15), "mock algebra requires small constants"
        return jnp.int32(v)

    add = staticmethod(lambda a, b: a + b)
    mul = staticmethod(lambda a, b: a * b)
    neg = staticmethod(lambda a: -a)


def _getter(values):
    def get(col, rot):
        v = values[col].astype(jnp.int32)
        return jnp.roll(v, -rot) if rot else v

    return get


def _pack(components):
    """Pack byte-ranged components into one uint32 key (msb-first)."""
    key = jnp.zeros_like(components[0], dtype=jnp.uint32)
    for c in components:
        key = (key << 8) | c.astype(jnp.uint32)
    return key


def _sorted_table(layout: CompiledCircuit, lk_index: int, usable: int):
    """Pre-sorted packed table keys for lookup ``lk_index``.

    Computed ONCE on host in numpy and cached on the layout: the table
    columns are fixed at layout time, and sorting them inside a jit makes
    XLA constant-fold a 131k-row sort per lookup per compile (multi-
    second stalls, see MULTICHIP_r01 logs)."""
    cache = layout.meta.setdefault("_sorted_tables", {})
    if lk_index not in cache:
        lk = layout.cs.lookups[lk_index]
        key = np.zeros(usable, dtype=np.uint32)
        for _, c in lk.pairs:
            key = (key << 8) | layout.fixed[c][:usable].astype(np.uint32)
        cache[lk_index] = np.sort(key)
    return cache[lk_index]


@dataclass
class MockReport:
    gate_failures: list = dfield(default_factory=list)      # (name, rows)
    lookup_failures: list = dfield(default_factory=list)    # (name, rows)
    perm_failures: np.ndarray = None                        # failing pair idx

    @property
    def ok(self) -> bool:
        return (
            not self.gate_failures
            and not self.lookup_failures
            and (self.perm_failures is None or len(self.perm_failures) == 0)
        )

    def message(self) -> str:
        if self.ok:
            return "satisfied"
        lines = []
        for name, rows in self.gate_failures:
            lines.append(f"gate '{name}' violated at rows {rows[:8].tolist()}"
                         f" ({len(rows)} rows)")
        for name, rows in self.lookup_failures:
            lines.append(f"lookup '{name}' input not in table at rows "
                         f"{rows[:8].tolist()} ({len(rows)} rows)")
        if self.perm_failures is not None and len(self.perm_failures):
            lines.append(f"{len(self.perm_failures)} copy constraints violated "
                         f"(first pair indices {self.perm_failures[:8].tolist()})")
        return "; ".join(lines)


def violation_counts(layout: CompiledCircuit, values):
    """Jittable core: total violation count per constraint class.

    Returns dict of int32 scalars {gates, lookups, copies}; all zero iff
    the circuit is satisfied.  Unlike :func:`check` this extracts no row
    indices, so the whole evaluation stays on device inside one jit.
    """
    usable = layout.usable_rows
    get = _getter(values)
    alg = Int32Algebra
    row_ok = jnp.arange(layout.n) < usable

    gate_bad = jnp.int32(0)
    for _, gate in layout.cs.gates:
        out = gate.eval(alg, get)
        gate_bad += jnp.sum(((out != 0) & row_ok).astype(jnp.int32))

    lookup_bad = jnp.int32(0)
    for i, lk in enumerate(layout.cs.lookups):
        inputs = _pack([e.eval(alg, get) for e, _ in lk.pairs])[:usable]
        table_sorted = jnp.asarray(_sorted_table(layout, i, usable))
        pos = jnp.clip(jnp.searchsorted(table_sorted, inputs), 0, usable - 1)
        lookup_bad += jnp.sum((table_sorted[pos] != inputs).astype(jnp.int32))

    cp = jnp.asarray(layout.copy_pairs)
    va = values[cp[:, 0], cp[:, 1]]
    vb = values[cp[:, 2], cp[:, 3]]
    copy_bad = jnp.sum((va != vb).astype(jnp.int32))
    return {"gates": gate_bad, "lookups": lookup_bad, "copies": copy_bad}


def check(layout: CompiledCircuit, values) -> MockReport:
    """values: uint32[num_columns, n] from witness.assemble_values."""
    n = layout.n
    usable = layout.usable_rows
    get = _getter(values)
    alg = Int32Algebra
    report = MockReport()
    row_ids = np.arange(n)

    for name, gate in layout.cs.gates:
        out = np.asarray(gate.eval(alg, get))
        bad = row_ids[(out != 0) & (row_ids < usable)]
        if len(bad):
            report.gate_failures.append((name, bad))

    for i, lk in enumerate(layout.cs.lookups):
        inputs = _pack([e.eval(alg, get) for e, _ in lk.pairs])[:usable]
        table_sorted = jnp.asarray(_sorted_table(layout, i, usable))
        pos = jnp.searchsorted(table_sorted, inputs)
        pos = jnp.clip(pos, 0, usable - 1)
        ok = table_sorted[pos] == inputs
        bad = np.arange(usable)[~np.asarray(ok)]
        if len(bad):
            report.lookup_failures.append((lk.name, bad))

    cp = layout.copy_pairs
    va = np.asarray(values)[cp[:, 0], cp[:, 1]]
    vb = np.asarray(values)[cp[:, 2], cp[:, 3]]
    report.perm_failures = np.nonzero(va != vb)[0]
    return report


def assert_satisfied(layout: CompiledCircuit, values):
    report = check(layout, values)
    if not report.ok:
        raise AssertionError(f"circuit not satisfied: {report.message()}")
