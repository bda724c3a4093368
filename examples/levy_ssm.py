"""Lévy-SSM latent state inference with PGAS.

Mirror of ``/root/reference/examples/levy-ssm/script.jl``: Langevin dynamics driven
by a Gamma-process subordinator, linear-Gaussian observation of the first state
component; PGAS recovers the marginal state trajectories.

Run:  python examples/levy_ssm.py  [--particles 50] [--steps 200] [--iters 100]
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

import advancedps_tpu as aps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=50)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--iters", type=int, default=100)
    args = p.parse_args()

    # Reference simulation parameters (script.jl:114-117): ts = range(0,100;N),
    # θ=-0.5, σe=1, C=1, β=1, μw=0, σw=1.
    dt = 100.0 / args.steps
    model = aps.models.levy_ssm(dt=dt, theta=-0.5, sigma_e=1.0, C=1.0, beta=1.0)
    xs, ys = aps.simulate(jax.random.key(1234), model, args.steps)
    traced = aps.TracedSSM(model, ys)

    t0 = time.perf_counter()
    chain = aps.sample(jax.random.key(1), traced, aps.PGAS(args.particles), args.iters)
    jax.block_until_ready(chain.trajectory)
    dt_run = time.perf_counter() - t0

    traj = np.asarray(chain.trajectory)  # [iters, T, 2]
    burn = args.iters // 4
    mean_traj = traj[burn:].mean(axis=0)
    rmse = np.sqrt(np.mean((mean_traj - np.asarray(xs)) ** 2, axis=0))

    print(f"PGAS({args.particles}) x {args.iters}, T={args.steps}: {dt_run:.2f}s")
    print(f"marginal-state RMSE vs truth: x1={rmse[0]:.3f} x2={rmse[1]:.3f}")
    print(f"final log-evidence: {float(chain.log_evidence[-1]):.2f}")


if __name__ == "__main__":
    main()
