"""Headline benchmark: particles/sec/chip on a 1M-particle LGSSM bootstrap sweep.

The reference publishes no speed numbers (BASELINE.md); the baseline for
``vs_baseline`` is therefore a native single-core C++ implementation of the same
bootstrap particle filter (``cpp/resampling.cpp::aps_lgssm_sweep`` — the closest
stand-in for the reference's compiled single-process Julia loop,
``/root/reference/src/container.jl:316-363``), measured on this machine at a
smaller N and compared by per-particle-step throughput.  Falls back to a
vectorised NumPy implementation if g++ is unavailable.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
Diagnostics go to stderr.
"""

import glob
import json
import math
import os
import re
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prior_round_value(metric: str, min_round: int = 0):
    """Best recorded value of ``metric`` across the driver's BENCH_r*.json
    artifacts — the ratchet: regressions vs ANY prior round must be loud
    (round 2 regressed 2.2x vs round 1 silently; comparing only to the
    immediately-prior round would have normalised that).

    ``min_round`` excludes rounds measured under a different methodology:
    rounds 1-2 timed one blocking dispatch per sweep (~21 ms of axon-tunnel
    RTT inside every measurement), round 3+ time batched steady-state device
    throughput — not apples-to-apples (ADVICE r3)."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_round, best_val = -1, None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m or int(m.group(1)) < min_round:
            continue
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except Exception:
            continue
        # The driver wraps the printed JSON line under "parsed"; accept both
        # the wrapped record and a bare metric dict / list of dicts.
        if isinstance(rec, dict) and "parsed" in rec:
            rec = rec["parsed"]
        recs = rec if isinstance(rec, list) else [rec]
        for r in recs:
            if isinstance(r, dict) and r.get("metric") == metric:
                v = float(r["value"])
                if best_val is None or v > best_val:
                    best_round, best_val = int(m.group(1)), v
    return best_round, best_val


def ratchet(metric: str, value: float, min_round: int = 0):
    rnd, prev = prior_round_value(metric, min_round)
    if prev is None:
        log(f"ratchet: no prior round recorded for {metric}")
        return
    rel = value / prev - 1.0
    log(f"ratchet: round {rnd} recorded {prev:.3e}; this run {value:.3e} ({rel:+.1%})")
    if value < 0.9 * prev:
        log(
            f"WARNING: REGRESSION >10% vs round {rnd} "
            f"({prev:.3e} -> {value:.3e}). Do not ship without a root cause."
        )


# --- config (headline: 1M particles, T=100 — BASELINE.json) ---------------------
N = 1_000_000
T = 100
A, Q, R = 0.9, 0.32, 1.0
N_NUMPY = 100_000  # baseline measured here, throughput is N-linear (checked)


def native_baseline_rate(ys: np.ndarray, sigma0: float) -> float:
    """Single-core C++ bootstrap sweep (cpp/resampling.cpp).

    Best of 3 runs — a single cold run is noisy (±30%) on a shared host and
    that noise would leak straight into ``vs_baseline``.
    """
    from advancedps_tpu.ops import native

    n = N_NUMPY
    T = len(ys)
    rng = np.random.default_rng(0)
    init_noise = rng.standard_normal(n).astype(np.float32)
    step_noise = rng.standard_normal((T - 1) * n).astype(np.float32)
    res_u = rng.random(T).astype(np.float32)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        native.lgssm_sweep(ys, init_noise, step_noise, res_u, n, A, Q, R, sigma0)
        best = min(best, time.perf_counter() - t0)
    return n * T / best


def numpy_baseline_rate(ys: np.ndarray) -> float:
    """Vectorised NumPy bootstrap filter (adaptive systematic resampling)."""
    rng = np.random.default_rng(0)
    sigma0 = math.sqrt(Q * Q / (1 - A * A))
    n = N_NUMPY

    def run():
        x = rng.standard_normal(n) * sigma0
        logw = -0.5 * ((ys[0] - x) / R) ** 2 - math.log(R) - 0.5 * math.log(2 * math.pi)
        log_z = 0.0
        for t in range(1, T):
            m = logw.max()
            w = np.exp(logw - m)
            sw = w.sum()
            wn = w / sw
            ess = 1.0 / np.square(wn).sum()
            if ess <= 0.5 * n:
                u = rng.random()
                pos = (u + np.arange(n)) / n
                idx = np.searchsorted(np.cumsum(wn), pos, side="right").clip(0, n - 1)
                x = x[idx]
                logw = np.zeros(n)
            x = A * x + rng.standard_normal(n) * Q
            logw = logw - 0.5 * ((ys[t] - x) / R) ** 2 - math.log(R) - 0.5 * math.log(2 * math.pi)
        return log_z

    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return n * T / dt


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the remote-TPU first compile of the 1M-particle
    # sweep costs minutes; cache it across bench runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/aps_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import advancedps_tpu as aps
    from advancedps_tpu.engine import sweep
    from advancedps_tpu.smc import SSMKernel

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    model = aps.models.stationary_lgssm(a=A, q=Q, r=R)
    _, ys = aps.simulate(jax.random.key(0), model, T)
    traced = aps.TracedSSM(model, ys)
    kernel = SSMKernel(ssm=traced)
    gated = aps.SMC(N).resampler

    @jax.jit
    def run(key):
        res = sweep(key, kernel, N, gated, store_states=False)
        return res.log_evidence

    # compile + warmup, instrumented (round-4 verdict #2: the 282.9 s
    # "compile+first run" of BENCH_r04 vs 23.1 s of r03 was the persistent
    # cache's state, not a code regression — the r04 bench ran against a
    # program whose HLO had changed since the cache was last warmed, paying
    # the inherent ~minutes-class remote AOT of a fresh 1M pallas program.
    # Split the phases and say which case this run hit so rounds compare
    # mechanically.)
    n_cache = len(glob.glob("/tmp/aps_jax_cache/*")) if os.path.isdir("/tmp/aps_jax_cache") else 0
    t0 = time.perf_counter()
    lowered = run.lower(jax.random.key(1))
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    lz = float(compiled(jax.random.key(1)))
    t_first = time.perf_counter() - t0
    log(
        f"compile+first run: {t_lower+t_compile+t_first:.1f}s  logZ={lz:.3f}  "
        f"(trace+lower {t_lower:.1f}s, backend compile {t_compile:.1f}s "
        f"[{'WARM persistent-cache hit' if t_compile < 15 else 'COLD: new program, remote AOT'}; "
        f"{n_cache} cached entries], first dispatch {t_first:.1f}s)"
    )

    # Populate the jit wrapper's own cache (hits the now-warm persistent
    # cache) so the latency loop below measures dispatches, not a compile.
    run(jax.random.key(1)).block_until_ready()

    # correctness anchor vs exact Kalman
    kf = aps.utils.kalman_filter(
        np.asarray(ys), A, 0.0, Q, 1.0, R, 0.0, math.sqrt(Q * Q / (1 - A * A))
    )
    err = abs(lz - float(kf.log_likelihood))
    log(f"logZ error vs Kalman: {err:.4f}")
    assert err < 1.0, "bench run failed correctness anchor"

    # Per-dispatch latency (diagnostic): one sweep per dispatch, blocking each.
    # Over the axon tunnel this includes a ~30 ms host<->TPU round trip per
    # iteration, which is a property of the remote-access setup, not the chip.
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        run(jax.random.key(2 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    log(
        f"per-dispatch latency (incl. tunnel RTT): "
        f"{[f'{t*1e3:.1f}ms' for t in times]}  median {np.median(times)*1e3:.1f}ms"
    )

    # Headline: steady-state device throughput.  K sweeps run inside ONE jitted
    # call (lax.map over keys), so the device executes them back-to-back and the
    # tunnel round trip is paid once per batch instead of once per sweep — the
    # same number a local-host deployment would see per sweep.
    K = 5

    @jax.jit
    def run_batch(keys):
        return jax.lax.map(run, keys)

    def batch_keys(rep: int):
        return jax.random.split(jax.random.fold_in(jax.random.key(7), rep), K)

    lzs = run_batch(batch_keys(0))  # compile + warmup
    lzs.block_until_ready()
    batch_times = []
    # Fresh keys per repetition: docs/design.md warns the axon tunnel memoises
    # repeated identical dispatches, which would turn the headline into a cache
    # artifact (ADVICE r3).
    for rep in range(1, 4):
        keys_r = batch_keys(rep)
        t0 = time.perf_counter()
        run_batch(keys_r).block_until_ready()
        batch_times.append((time.perf_counter() - t0) / K)
    dt = float(np.median(batch_times))
    rate = N * T / dt
    log(f"batched per-sweep times: {[f'{t*1e3:.1f}ms' for t in batch_times]}  median {dt*1e3:.1f}ms")
    log(f"throughput: {rate/1e9:.3f} G particle-steps/s/chip")

    from advancedps_tpu.ops import native

    sigma0 = math.sqrt(Q * Q / (1 - A * A))
    if native.available():
        np_rate = native_baseline_rate(np.asarray(ys), sigma0)
        log(f"native C++ baseline: {np_rate/1e6:.1f} M particle-steps/s")
    else:
        np_rate = numpy_baseline_rate(np.asarray(ys))
        log(f"numpy baseline: {np_rate/1e6:.1f} M particle-steps/s")

    # min_round=3: steady-state batched methodology begins at round 3; earlier
    # rounds' per-dispatch numbers include tunnel RTT and are not comparable.
    ratchet("lgssm_sweep_particle_steps_per_sec_per_chip", rate, min_round=3)
    print(
        json.dumps(
            {
                "metric": "lgssm_sweep_particle_steps_per_sec_per_chip",
                "value": rate,
                "unit": "particle-steps/s",
                "vs_baseline": rate / np_rate,
            }
        )
    )


if __name__ == "__main__":
    main()
