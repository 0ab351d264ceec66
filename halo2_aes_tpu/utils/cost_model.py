"""Circuit cost estimator.

Role of the reference's cost-estimator feature
(reference src/aes128.rs:458-477: from_circuit_to_model_circuit -> JSON
dump).  Estimates proof size exactly from the protocol layout and prove
work in NTT/MSM op counts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from halo2_aes_tpu.backend import protocol as PROTO
from halo2_aes_tpu.circuit.ir import ADVICE, FIXED, INSTANCE, CompiledCircuit


@dataclass
class CostModel:
    k: int
    ext_k: int
    advice_columns: int
    fixed_columns: int
    instance_columns: int
    gates: int
    lookups: int
    perm_columns: int
    perm_chunks: int
    max_degree: int
    proof_points: int
    proof_scalars: int
    proof_bytes: int
    commit_msms: int          # size-n MSMs per proof
    ntts_base: int            # size-n NTTs per proof
    ntts_extended: int        # size-ext_n NTTs per proof

    def json(self) -> str:
        return json.dumps(self.__dict__, indent=2)


def estimate(layout: CompiledCircuit, multiopen: str = "shplonk") -> CostModel:
    cs = layout.cs
    kinds = [c.kind for c in cs.columns]
    n_adv = kinds.count(ADVICE)
    n_fix = kinds.count(FIXED)
    n_inst = kinds.count(INSTANCE)
    n_lk = len(cs.lookups)
    chunk_len = cs.permutation_chunk_len()
    chunks = -(-len(cs.perm_columns) // chunk_len) if cs.perm_columns else 0
    degree = cs.degree()

    plan = PROTO.open_queries(cs)
    evals = sum(1 for key, _ in plan if key[0] != "h")
    # advice + 2 per lookup (A', S') + perm z + lookup z + random +
    # d-1 h pieces + opening witnesses (SHPLONK: 2; GWC: one per
    # distinct rotation point)
    n_open = 2 if multiopen == "shplonk" else len({rot for _, rot in plan})
    points = n_adv + 2 * n_lk + chunks + n_lk + 1 + (degree - 1) + n_open
    proof_bytes = 32 * (points + evals)

    # prover work model
    commit_msms = points
    ntts_base = n_adv + 3 * n_lk + chunks + 4  # coeff conversions + multiopen
    ext_polys = (
        len({c for _, g in cs.gates for c, _ in g.columns()}
            | {c for lk in cs.lookups for e, tc in lk.pairs
               for c in [tc] + [cc for cc, _ in e.columns()]}
            | set(cs.perm_columns))
        + len(cs.perm_columns) + chunks + 3 * n_lk + 3 + 1
    )
    return CostModel(
        k=layout.k,
        ext_k=layout.k + max(1, (degree - 2).bit_length()),
        advice_columns=n_adv,
        fixed_columns=n_fix,
        instance_columns=n_inst,
        gates=len(cs.gates),
        lookups=n_lk,
        perm_columns=len(cs.perm_columns),
        perm_chunks=chunks,
        max_degree=degree,
        proof_points=points,
        proof_scalars=evals,
        proof_bytes=proof_bytes,
        commit_msms=commit_msms,
        ntts_base=ntts_base,
        ntts_extended=ext_polys,
    )
