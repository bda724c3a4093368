"""Particle Gibbs for a Gaussian state-space model.

Mirror of ``/root/reference/examples/gaussian-ssm/script.jl``: a linear-Gaussian
random walk with stationary prior; PGAS over the latent states; posterior mean
trajectory compared against the simulated truth and the exact Kalman filter.

Run:  python examples/gaussian_ssm.py  [--particles 20] [--steps 200] [--iters 500]
"""

import argparse
import math
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

import advancedps_tpu as aps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=20)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--iters", type=int, default=500)
    args = p.parse_args()

    # θ = (a, q, r) known; sample latents (reference script.jl:72-75).
    a, q, r = 0.9, 0.32, 1.0
    model = aps.models.stationary_lgssm(a=a, q=q, r=r)
    xs, ys = aps.simulate(jax.random.key(1234), model, args.steps)
    traced = aps.TracedSSM(model, ys)

    pgas = aps.PGAS(args.particles)
    t0 = time.perf_counter()
    chain = aps.sample(jax.random.key(1), traced, pgas, args.iters)
    _ = float(np.asarray(chain.log_evidence)[-1])  # force fetch
    dt_first = time.perf_counter() - t0
    # Steady-state throughput: second call reuses the compiled chain program.
    t0 = time.perf_counter()
    chain2 = aps.sample(jax.random.key(2), traced, pgas, args.iters)
    _ = float(np.asarray(chain2.log_evidence)[-1])
    dt = time.perf_counter() - t0

    traj = np.asarray(chain.trajectory)  # [iters, T]
    burn = args.iters // 4
    mean_traj = traj[burn:].mean(axis=0)

    kf = aps.utils.kalman_filter(
        np.asarray(ys), a, 0.0, q, 1.0, r, 0.0, math.sqrt(q * q / (1 - a * a))
    )
    rmse_truth = float(np.sqrt(np.mean((mean_traj - np.asarray(xs)) ** 2)))
    rmse_kalman = float(np.sqrt(np.mean((mean_traj - np.asarray(kf.means)) ** 2)))

    print(f"PGAS({args.particles}) x {args.iters} iters, T={args.steps}: {dt:.2f}s "
          f"({args.iters / dt:.1f} iters/s; first call incl. compile {dt_first:.2f}s)")
    print(f"posterior-mean RMSE vs truth:  {rmse_truth:.4f}")
    print(f"posterior-mean RMSE vs Kalman filter means: {rmse_kalman:.4f}")
    print(f"mean log-evidence: {float(np.mean(np.asarray(chain.log_evidence))):.3f} "
          f"(exact {float(kf.log_likelihood):.3f})")


if __name__ == "__main__":
    main()
