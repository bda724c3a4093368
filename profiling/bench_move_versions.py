"""Ad-hoc TPU timing of the fused decode+move kernel versions at N=1M.

Run from /root/repo with ambient env:  python profiling/bench_move_versions.py

Times each registered kernel version on realistic extents (ESS ~ 0.5N gamma
weights) and on degenerate profiles, D=1 and D=2, amortised over an inner scan
(one scalar fetch per measurement — the axon tunnel RTT is ~30 ms).  Also
cross-checks that all versions decode identical ancestors / bitwise-identical
moved values ON HARDWARE (the pytest suite pins interpret mode only).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--versions", type=str, default=None)
    ap.add_argument("--profiles", type=str, default="even,skewed")
    ap.add_argument("--dims", type=str, default="1,2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/aps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from advancedps_tpu.ops import pallas_resample as pr

    versions = (
        [int(v) for v in args.versions.split(",")]
        if args.versions
        else sorted(pr._MOVE_IMPLS)
    )
    dims = [int(d) for d in args.dims.split(",")]
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)

    def extents(profile):
        if profile == "even":
            w = rng.gamma(2.0, size=N)
        elif profile == "skewed":
            w = rng.gamma(0.1, size=N)
        elif profile == "degenerate":
            w = np.full(N, 1e-12)
            w[rng.integers(N, size=20)] = 1.0
        w = (w / w.sum()).astype(np.float32)
        cdf = np.cumsum(w)
        f = np.clip(np.ceil(N * cdf - 0.37), 0, N).astype(np.int32)
        return jnp.asarray(f)

    def bench_one(ver, f, d):
        cols = tuple(
            jnp.asarray(rng.standard_normal(N).astype(np.float32)) for _ in range(d)
        )

        @jax.jit
        def run(f, cols):
            def body(c, i):
                # VARY the extents per iteration: with loop-invariant operands
                # XLA hoists the (pure) kernel out of the scan and the reading
                # is ~inner-count× too fast (round-4 lesson, git history).
                f_i = jnp.clip(f + (i % 2), 0, N)
                anc, ys = pr._MOVE_IMPLS[ver](f_i, cols, N)
                s = anc[0] + anc[N - 1]
                return c + s * 1e-9 + ys[0][0] * 1e-9, ()

            c, _ = jax.lax.scan(body, 0.0, jnp.arange(args.inner))
            return c

        t0 = time.perf_counter()
        float(run(f, cols))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(f, cols))
            ts.append(time.perf_counter() - t0)
        wall = float(np.median(ts))
        per = (wall - 0.03) / args.inner  # ~30ms tunnel RTT subtracted
        return per, compile_s

    # hardware cross-check: identical outputs across versions
    f = extents("even")
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    outs = {}
    for ver in versions:
        anc, ys = jax.jit(
            lambda f, x, v=ver: pr._MOVE_IMPLS[v](f, (x,), N)
        )(f, x)
        outs[ver] = (np.asarray(anc), np.asarray(ys[0]))
    v0 = versions[0]
    for ver in versions[1:]:
        np.testing.assert_array_equal(outs[v0][0], outs[ver][0])
        np.testing.assert_array_equal(outs[v0][1], outs[ver][1])
    log(f"hardware cross-check: versions {versions} identical  OK")

    for profile in args.profiles.split(","):
        f = extents(profile)
        for d in dims:
            row = []
            for ver in versions:
                per, comp = bench_one(ver, f, d)
                row.append(f"v{ver} {per*1e3:7.3f}ms (compile {comp:.0f}s)")
            log(f"[{profile:>10} D={d}] " + "   ".join(row))


if __name__ == "__main__":
    main()
