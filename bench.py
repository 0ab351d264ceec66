"""Headline benchmark: prints ONE JSON line with the flagship metric.

Flagship: steady-state AES-128 PROVING throughput — full KZG/SHPLONK
proof of a multi-block AES-128 circuit on the attached device (role of
the reference's only real entry point: `cargo run` proving 3000 blocks
in one proof, reference src/main.rs:83-108).  One warm-up prove pays
all compiles; the timed prove is the steady state a serving deployment
sees.

Emission contract: this script ALWAYS prints exactly one JSON line to
stdout, under every cache/device state.  The measured prove runs in a
time-boxed SUBPROCESS (progress on stderr); on overrun or failure the
parent falls back, in order, to (a) the last hardware-verified number
recorded in the tracked ``bench_config.json`` (labeled ``"stale":
true``), (b) the CPU witness+constraint-check metric, (c) a zero-value
sentinel.  A compile storm can therefore cost accuracy, never the
artifact.

``vs_baseline``: the reference publishes NO numbers (BASELINE.md) and
its checked-in AES bench cannot run (reference/benches/aes128.rs:90
requests 6000 > 3853 capacity).  The point value divides by an ESTIMATE
of the Rust prover's throughput on a desktop CPU; ``vs_baseline_range``
brackets it with the repo's own field-mul census divided by a
documented CPU Montgomery-mul throughput range (see BASELINE.md,
"Baseline denominator arithmetic").

To prime every cache this bench uses (SRS, pk, MSM tables, XLA
executables) with EXACTLY the graphs the driver will run, execute
``python bench.py`` itself once on the target host.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CONFIG_PATH = os.path.join(REPO, "bench_config.json")

# Estimated reference (Rust halo2 CPU) AES proving throughput.  The
# driver config (K=20, N=4, 3000 blocks/proof) on a modern desktop CPU
# takes minutes per proof for lookup-heavy circuits; 3000 blocks /
# ~200 s ~= 15 blocks/s.  ESTIMATE — not a measurement (no Rust
# toolchain in this environment); bracketed by vs_baseline_range.
ESTIMATED_RUST_BLOCKS_PER_SEC = 15.0

# Documented CPU Montgomery-mul throughput range for the bracket:
# 20-100 Mmul/s/core for 254-bit Montgomery muls (4x64 limbs, ~45-90
# cycles at 3-4 GHz) x 8 rayon cores on the notional desktop running
# the reference driver.  BASELINE.md records the arithmetic.
CPU_MULS_PER_SEC_RANGE = (20e6 * 8, 100e6 * 8)


def _read_config() -> dict:
    """The tracked record of the best config PROVEN on this hardware.

    ``bench_config.json`` (repo root, committed) is written by
    scripts/prove_steady.py --record-bench-config and by this script
    after every successful measured run.  The bench must never gamble
    on an untested shape: a k=20 HBM OOM through the axon tunnel can
    wedge the process, not just fail it."""
    for path in (CONFIG_PATH, os.path.join(REPO, "ptau", "bench_config.json")):
        try:
            with open(path) as f:
                cfg = json.load(f)
            if cfg.get("verified"):
                return cfg
        except (OSError, ValueError, KeyError):
            continue
    return {"k": 17, "n_sets": 1, "n_blocks": 96, "tagged_ops": False,
            "verified": False}


def _tick(msg: str) -> None:
    print(f"bench: {msg}", file=sys.stderr, flush=True)


def bench_prove(k: int, blocks: int, sets: int, tagged: bool,
                lookup_sort: str = "field") -> dict:
    # blocks = FULL circuit capacity for the config: prover cost is
    # domain-size-bound, so throughput is measured with the circuit full
    # (the reference driver likewise fills its circuit, src/main.rs:25)
    from halo2_aes_tpu.ops import field

    field.set_compact_graphs(True)
    import jax

    from halo2_aes_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if jax.default_backend() != "cpu":
        from halo2_aes_tpu.ops import pallas_field

        pallas_field.enable_in_field_ops()
    import jax.numpy as jnp
    import numpy as np

    from halo2_aes_tpu.backend import srs as SRS
    from halo2_aes_tpu.backend.keygen import keygen_cached
    from halo2_aes_tpu.backend.prover import prove
    from halo2_aes_tpu.backend.verifier import verify
    from halo2_aes_tpu.circuit import witness
    from halo2_aes_tpu.models.aes128 import AesConfig, compile_circuit

    t0 = time.perf_counter()
    layout = compile_circuit(AesConfig(k=k, n_sets=sets, n_blocks=blocks,
                                       tagged_ops=tagged))
    srs = SRS.setup(k)
    _tick(f"srs ready [t={time.perf_counter()-t0:.0f}s]")
    pk = keygen_cached(layout, srs)
    _tick(f"keygen ready [t={time.perf_counter()-t0:.0f}s]")

    rng = np.random.default_rng(0)
    key = rng.integers(0, 256, 16, dtype=np.uint8)
    pts = rng.integers(0, 256, (blocks, 16), dtype=np.uint8)
    pool = witness.build_pool(jnp.asarray(key), jnp.asarray(pts))
    values = jax.block_until_ready(witness.assemble_values(layout, pool))

    proof = prove(pk, values, lookup_sort=lookup_sort)   # warm-up compile
    _tick(f"warm-up prove done [t={time.perf_counter()-t0:.0f}s]")
    t0 = time.perf_counter()
    proof = prove(pk, values, lookup_sort=lookup_sort)
    dt = time.perf_counter() - t0
    _tick(f"timed prove {dt:.2f}s")
    verify(pk.vk, proof)
    bps = blocks / dt

    from halo2_aes_tpu.utils import cost_model

    muls = cost_model.field_muls(layout)
    rust_hi = blocks * CPU_MULS_PER_SEC_RANGE[1] / muls["total"]
    rust_lo = blocks * CPU_MULS_PER_SEC_RANGE[0] / muls["total"]
    return {
        "metric": f"aes128_prove_blocks_per_sec_k{k}_warm",
        "value": round(bps, 3),
        "unit": "blocks/s",
        "vs_baseline": round(bps / ESTIMATED_RUST_BLOCKS_PER_SEC, 2),
        "baseline_is_estimate": True,
        "vs_baseline_range": [round(bps / rust_hi, 2),
                              round(bps / rust_lo, 2)],
        "prove_seconds": round(dt, 2),
        "blocks_per_proof": blocks,
        "n_sets": sets,
        "tagged_ops": tagged,
        "lookup_sort": lookup_sort,
        "proof_bytes": len(proof),
        "field_muls_per_proof": muls["total"],
        "field_muls_per_sec": round(muls["total"] / dt),
        "verified": True,
    }


def bench_mock() -> dict:
    import jax
    import jax.numpy as jnp

    from halo2_aes_tpu.circuit import mock, witness
    from halo2_aes_tpu.models.aes128 import AesConfig, compile_circuit

    cfg = AesConfig(k=17, n_sets=2, n_blocks=192)
    layout = compile_circuit(cfg)

    @jax.jit
    def step(key, plaintexts):
        pool = witness.build_pool(key, plaintexts)
        values = witness.assemble_values(layout, pool)
        return mock.violation_counts(layout, values)

    key = jnp.zeros(16, dtype=jnp.uint8)
    plaintexts = jnp.arange(cfg.n_blocks * 16, dtype=jnp.uint8).reshape(-1, 16)
    counts = jax.block_until_ready(step(key, plaintexts))
    assert all(int(v) == 0 for v in counts.values()), counts
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        counts = jax.block_until_ready(step(key, plaintexts))
    dt = (time.perf_counter() - t0) / reps
    return {
        "metric": "aes128_witness_plus_constraint_check_blocks_per_sec_k17",
        "value": round(cfg.n_blocks / dt, 2),
        "unit": "blocks/s",
        "vs_baseline": None,
    }


def _device_reachable(timeout_s: float = 240.0) -> bool:
    """Probe device init in a SUBPROCESS with a hard timeout.

    The axon TPU tunnel can hang in PJRT init indefinitely (observed
    after a device-side OOM while the pool grant expires); probing
    in-process would wedge the whole bench."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _emit(out: dict) -> None:
    print(json.dumps(out), flush=True)


def _mock_fallback(note: str) -> dict:
    try:
        import jax

        if jax.default_backend() != "cpu":
            # sitecustomize has already imported jax, so env vars are
            # too late — switch the platform in-process.
            jax.config.update("jax_platforms", "cpu")
        out = bench_mock()
        out["note"] = note
        return out
    except Exception as e:  # noqa: BLE001 — emission must never fail
        return {"metric": "aes128_prove_blocks_per_sec",
                "value": 0.0, "unit": "blocks/s", "vs_baseline": 0.0,
                "note": f"{note}; CPU fallback also failed: {e!r}"}


def _stale_fallback(cfg: dict, note: str) -> dict | None:
    """Best HARDWARE-VERIFIED number on record, labeled stale.

    The metric name carries a ``_stale`` suffix so no consumer can
    credit a replayed record as this run's measurement (ADVICE r4)."""
    bps = cfg.get("steady_blocks_per_sec")
    if not cfg.get("verified") or not bps:
        return None
    return {
        "metric": f"aes128_prove_blocks_per_sec_k{cfg['k']}_warm_stale",
        "value": float(bps),
        "unit": "blocks/s",
        "vs_baseline": round(float(bps) / ESTIMATED_RUST_BLOCKS_PER_SEC, 2),
        "baseline_is_estimate": True,
        "blocks_per_proof": cfg.get("n_blocks"),
        "n_sets": cfg.get("n_sets"),
        "tagged_ops": cfg.get("tagged_ops", False),
        "stale": True,
        "recorded_at": cfg.get("recorded_at"),
        "note": note,
    }


def _child_main() -> None:
    """Time-boxed measurement child: JSON on stdout, progress on stderr."""
    cfg = _read_config()
    out = bench_prove(k=int(cfg["k"]), blocks=int(cfg["n_blocks"]),
                      sets=int(cfg["n_sets"]),
                      tagged=bool(cfg.get("tagged_ops", False)),
                      lookup_sort=str(cfg.get("lookup_sort", "field")))
    _emit(out)


def _record_success(out: dict) -> None:
    """Refresh the tracked hardware-verified record after a good run."""
    try:
        cfg = {"k": int(out["metric"].split("_k")[-1].split("_")[0]),
               "n_sets": out["n_sets"], "n_blocks": out["blocks_per_proof"],
               "tagged_ops": out["tagged_ops"],
               "lookup_sort": out.get("lookup_sort", "field"),
               "verified": True,
               "steady_blocks_per_sec": out["value"],
               "prove_seconds": out["prove_seconds"],
               "proof_bytes": out["proof_bytes"],
               "recorded_at": time.strftime("%Y-%m-%d %H:%M UTC",
                                            time.gmtime())}
        with open(CONFIG_PATH, "w") as f:
            json.dump(cfg, f, indent=1)
    except Exception as e:  # noqa: BLE001 — recording is best-effort
        _tick(f"could not refresh bench_config.json: {e!r}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--prove-child":
        _child_main()
        return
    if os.environ.get("BENCH_MOCK") == "1":
        _emit(bench_mock())
        return
    cfg = _read_config()
    budget = float(os.environ.get("BENCH_TIMEOUT_S", "1260"))
    # The axon pool grant wedges for tens of minutes after an unclean
    # process death (measured r5: probes hang, 100% iowait).  Spend up
    # to half the budget probing before giving up — a wedge that clears
    # mid-window still yields a live number.
    probe_deadline = time.monotonic() + 0.5 * budget
    reachable = False
    while True:
        if _device_reachable():
            reachable = True
            break
        if time.monotonic() >= probe_deadline:
            break
        _tick("device unreachable; re-probing (axon pool wedge?)")
        time.sleep(60)
    if not reachable:
        out = _stale_fallback(cfg, "device unreachable after probe window")
        if out is None:
            out = _mock_fallback("device unreachable; CPU fallback metric")
        _emit(out)
        return

    _tick(f"config k={cfg['k']} sets={cfg['n_sets']} "
          f"blocks={cfg['n_blocks']} tagged={cfg.get('tagged_ops', False)}; "
          f"budget {budget:.0f}s")
    # Retry the child while total wall < 2x budget: the persistent XLA
    # cache makes every attempt strictly incremental — a child killed
    # mid-compile-storm leaves its finished executables on disk, so the
    # next child resumes where it died (VERDICT r4 task 1a).
    deadline = time.monotonic() + 2.0 * budget
    note = None
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining < 120.0:
            break
        try:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--prove-child"],
                stdout=subprocess.PIPE, stderr=None, text=True, cwd=REPO,
                start_new_session=True)
            try:
                stdout, _ = proc.communicate(timeout=min(budget, remaining))
                if proc.returncode == 0:
                    out = json.loads(stdout.strip().splitlines()[-1])
                    _record_success(out)
                    _emit(out)
                    return
                note = f"measurement child rc={proc.returncode}"
            except subprocess.TimeoutExpired:
                import signal

                try:  # reap the child's whole session (XLA threads)
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError, OSError):
                    proc.kill()
                proc.wait()
                note = (f"measurement child exceeded "
                        f"{min(budget, remaining):.0f}s (compile storm?)")
        except (OSError, ValueError, IndexError) as e:
            note = f"measurement child failed: {e!r}"
        _tick(f"attempt {attempt}: {note}")
    note = note or "no attempt fit in the budget"
    _tick(note)
    out = _stale_fallback(cfg, note)
    if out is None:
        out = _mock_fallback(note)
    _emit(out)


if __name__ == "__main__":
    main()
