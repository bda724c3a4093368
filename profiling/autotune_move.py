"""Autotune the fused decode+move kernel's block sizes on the real TPU.

Times ``_resample_move_cols`` (v1 staircase) across (MC, MS, MW) tilings on
weight profiles matching what the headline sweep feeds the kernel at ESS-gate
firings (the gate fires at ESS <= 0.5N; logw ~ N(0, 0.84^2) gives ESS/N ~=
0.5), plus a heavy-tail profile (long offspring runs).  The winner becomes
``pallas_resample._MC/_MS/_MW``.  This harness retired the "census" kernel
variant: dense won at every degeneracy level (see git history).

Run from /root/repo with ambient env:  python profiling/autotune_move.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000
REPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/aps_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from advancedps_tpu.ops.pallas_resample import _resample_move_cols

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    key = jax.random.key(0)
    profiles = {
        # ESS/N ~= exp(-sigma^2) for lognormal weights.
        "ess0.5": 0.84 * jax.random.normal(key, (N,)),
        "ess0.1": 1.5 * jax.random.normal(key, (N,)),
        "heavy": jax.random.gamma(key, 1.0, (N,)),  # ESS/N ~ 1e-4, long runs
    }
    v = jax.random.normal(jax.random.fold_in(key, 1), (N,)).astype(jnp.float32)

    def extents(logw):
        w = jax.nn.softmax(logw)
        ess = 1.0 / (jnp.sum(w * w) * N)
        cdf = jnp.cumsum(w)
        return jnp.clip(jnp.ceil(N * cdf - 0.5), 0, N).astype(jnp.int32), ess

    tilings = [
        (1024, 512, 1024),  # current default
        (1024, 256, 1024),
        (1024, 128, 1024),
        (2048, 512, 1024),
        (2048, 256, 1024),
        (1024, 512, 2048),
        (1024, 256, 2048),
    ]

    for pname, logw in profiles.items():
        f, ess = extents(logw)
        f.block_until_ready()
        log(f"--- profile {pname}: ESS/N = {float(ess):.4f}")
        for tiles in tilings:
            @jax.jit
            def run(f, v, tiles=tiles):
                def body(acc, i):
                    # Tie an input to the carry so XLA cannot hoist the
                    # (otherwise loop-invariant) kernel call out of the scan.
                    vi = v.at[0].set(acc)
                    anc, ys = _resample_move_cols(f, (vi,), N, tiles=tiles)
                    out = ys[0][0] + 1e-6 * jnp.float32(anc[N - 1])
                    return out, ()

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), jnp.arange(REPS)
                )
                return acc

            try:
                run(f, v).block_until_ready()
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    run(f, v).block_until_ready()
                    ts.append((time.perf_counter() - t0) / REPS)
                dt = float(np.median(ts))
                log(f"{pname:8s} tiles={tiles}: {dt*1e3:.2f} ms/firing")
            except Exception as e:  # tiling may be unsupported
                log(f"{pname:8s} tiles={tiles}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
