"""Pluggable proving-backend seam.

Role of the reference's compile-time backend switch (reference
src/lib.rs:10-13, Cargo.toml:6-11: PSE halo2 vs a HyperPlonk fork behind
a feature flag): circuit code is written once against a small backend
interface; the backend is selected at runtime by name.

Currently registered: "kzg-shplonk" (the default, backend/prover.py),
"kzg-gwc" (same pipeline, plonk-style per-point multiopen), and "ipa"
(backend/ipa.py: a genuinely different proving SYSTEM — transparent
hash-derived basis, no trusted setup, no pairings, log-n recursive
opening argument), mirroring the reference's halo2-pse / hyperplonk
switch.  A multilinear/sumcheck backend can register here without
touching any circuit or model code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

_REGISTRY: dict = {}


@dataclass(frozen=True)
class Backend:
    name: str
    setup_srs: Callable       # (k, **kw) -> SRS-like
    keygen: Callable          # (layout, srs) -> ProvingKey-like (.vk)
    prove: Callable           # (pk, values_u32, instances=None, seed=None) -> bytes
    verify: Callable          # (vk, proof, instances=None) -> bool


def register(backend: Backend) -> None:
    _REGISTRY[backend.name] = backend


def get_backend(name: str = "kzg-shplonk") -> Backend:
    if name not in _REGISTRY:
        if name in ("kzg-shplonk", "kzg-gwc"):
            import functools

            from halo2_aes_tpu.backend import keygen as KG
            from halo2_aes_tpu.backend import prover as PV
            from halo2_aes_tpu.backend import srs as S
            from halo2_aes_tpu.backend import verifier as VF

            engine = name.split("-", 1)[1]
            register(Backend(
                name, S.setup, KG.keygen_cached,
                functools.partial(PV.prove, multiopen=engine),
                functools.partial(VF.verify, multiopen=engine),
            ))
        elif name == "ipa":
            import functools

            from halo2_aes_tpu.backend import ipa as IPA
            from halo2_aes_tpu.backend import keygen as KG
            from halo2_aes_tpu.backend import prover as PV

            register(Backend(
                name, IPA.setup, KG.keygen_cached,
                functools.partial(PV.prove, multiopen="ipa"),
                IPA.verify,
            ))
        else:
            raise KeyError(
                f"unknown backend {name!r}; registered: {sorted(_REGISTRY)}"
            )
    return _REGISTRY[name]
