"""Micro-profile of the resample branch at headline size (N=1M).

Breaks the ~65 ms resample share of the headline sweep into its XLA passes
(weight normalisation, cumsum→extents) and the Pallas decode+move kernel, and
counts how many steps actually fire the ESS gate.  Same amortised-timing method
as profile_sweep.py (axon tunnel: one scalar fetch per measurement).

Run from /root/repo with ambient env:  python profiling/profile_resample.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000
T = 100
A, Q, R_OBS = 0.9, 0.32, 1.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    reps = args.reps

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/aps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import advancedps_tpu as aps
    from advancedps_tpu.engine import sweep
    from advancedps_tpu.smc import SSMKernel
    from advancedps_tpu.ops import pallas_resample as pr

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    model = aps.models.stationary_lgssm(a=A, q=Q, r=R_OBS)
    _, ys = aps.simulate(jax.random.key(0), model, T)
    traced = aps.TracedSSM(model, ys)
    kernel = SSMKernel(ssm=traced)
    gated = aps.SMC(N).resampler

    # --- how many steps fire the gate?
    @jax.jit
    def firings(key):
        res = sweep(key, kernel, N, gated, store_states=False)
        return jnp.sum(res.resampled.astype(jnp.int32))

    nf = int(firings(jax.random.key(1)))
    log(f"ESS-gate firings per {T}-step sweep: {nf}")

    def amortized(one_rep):
        @jax.jit
        def f(key):
            def body(acc, i):
                return acc + one_rep(jax.random.fold_in(key, i)), ()

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps))
            return acc

        return f

    def measure(one_rep, label):
        f = amortized(one_rep)
        t0 = time.perf_counter()
        float(f(jax.random.key(0)))
        log(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s")
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(f(jax.random.key(i + 1)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    base = measure(lambda k: jnp.sum(jax.random.uniform(k, (8,))), "tunnel baseline")

    def dt_of(one_rep, label):
        wall = measure(one_rep, label)
        return (wall - base) / reps

    # components (each scanned over inner reps to amortise)
    def inner_scan(body, n_inner=16):
        def one(key):
            x0 = jax.random.uniform(key, (N,)) + 0.5
            def f(c, t):
                return body(c, t, key), ()
            c, _ = jax.lax.scan(f, x0, jnp.arange(n_inner))
            return jnp.sum(c) * 1e-9
        return one, n_inner

    # 1. exp-normalise pass (logw -> e)
    def norm_body(lw, t, key):
        m = jnp.max(lw)
        e = jnp.exp(lw - m)
        return e * 0.9999 + lw * 1e-6

    # 2. XLA cumsum 1M
    def cumsum_body(w, t, key):
        return jnp.cumsum(w) * 1e-7 + w * 0.5

    # 3. extents from cdf (ceil/clip pass)
    def extents_body(w, t, key):
        f = jnp.clip(jnp.ceil(N * w - 0.5), 0, N)
        return w * 0.9999 + f * 1e-9

    # 4. decode+move kernel alone (state D=1), constant plausible weights
    def kernelonly(key):
        w = jax.random.uniform(key, (N,)) + 0.5
        w = w / jnp.sum(w)
        x = jax.random.uniform(key, (N,))
        def f(c, t):
            x, w = c
            u = 0.25 + 1e-6 * t
            anc, moved = pr.resample_move(u, w, x, N)
            return (moved, w * 0.999999 + 1e-9 * anc[0]), ()
        (x, w), _ = jax.lax.scan(f, (x, w), jnp.arange(16))
        return jnp.sum(x) * 1e-9

    # 5. decode only (no move)
    def decodeonly(key):
        w = jax.random.uniform(key, (N,)) + 0.5
        w = w / jnp.sum(w)
        cdf = jnp.cumsum(w)
        def f(c, t):
            f_ext = jnp.clip(jnp.ceil(N * cdf - (0.25 + 1e-6 * t)), 0, N).astype(jnp.int32)
            anc = pr.decode_ancestors(f_ext, N)
            return c + anc[N - 1] * 1e-9, ()
        c, _ = jax.lax.scan(f, 0.0, jnp.arange(16))
        return c

    rows = [("tunnel round-trip (ms)", base * 1e3, 1)]
    for label, bodyfn in [
        ("exp-normalise [N] pass", norm_body),
        ("XLA cumsum [N]", cumsum_body),
        ("extents ceil/clip pass", extents_body),
    ]:
        one, n_inner = inner_scan(bodyfn)
        dt = dt_of(one, label)
        rows.append((label, dt * 1e3, n_inner))
    for label, one in [
        ("pallas decode+move (D=1)", kernelonly),
        ("pallas decode only", decodeonly),
    ]:
        dt = dt_of(one, label)
        rows.append((label, dt * 1e3, 16))

    log("")
    log(f"{'component':<30}{'per-call':>12}")
    for name, ms, n_inner in rows:
        log(f"{name:<30}{ms/n_inner:>10.3f}ms")


if __name__ == "__main__":
    main()
