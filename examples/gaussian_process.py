"""Gaussian-process state-space model (GP-SSM) with PGAS — non-Markovian dynamics.

Mirror of ``/root/reference/examples/gaussian-process/script.jl``: data simulated
from a stochastic-volatility model, inferred under a GP-SSM whose transition at step
t is the GP posterior conditioned on the particle's whole past trajectory.

Run:  python examples/gaussian_process.py  [--particles 20] [--steps 100] [--iters 250]
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
    p.add_argument("--particles", type=int, default=20)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--iters", type=int, default=250)
    args = p.parse_args()

    # Data from the SV model (script.jl:69-71), inference under the GP-SSM.
    true_model = aps.models.stochastic_volatility_ssm(a=0.9, q=0.5)
    xs, ys = aps.simulate(jax.random.key(1234), true_model, args.steps)

    gp_model = aps.models.gp_ssm(num_steps=args.steps)
    traced = aps.TracedSSM(gp_model, ys)

    t0 = time.perf_counter()
    chain = aps.sample(jax.random.key(1), traced, aps.PGAS(args.particles), args.iters)
    jax.block_until_ready(chain.trajectory)
    dt = time.perf_counter() - t0

    traj = np.asarray(chain.trajectory)
    burn = args.iters // 4
    mean_traj = traj[burn:].mean(axis=0)
    rmse = float(np.sqrt(np.mean((mean_traj - np.asarray(xs)) ** 2)))

    print(f"GP-SSM PGAS({args.particles}) x {args.iters}, T={args.steps}: {dt:.2f}s")
    print(f"posterior-mean RMSE vs latent truth: {rmse:.3f}")
    print(f"final log-evidence: {float(chain.log_evidence[-1]):.2f}")


if __name__ == "__main__":
    main()
