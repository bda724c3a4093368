"""Particle Gibbs with parameter learning: alternating PGAS + conjugate updates.

The BASELINE configuration "Particle Gibbs on nonlinear benchmark SSM (alternating
PG + parameter updates)": infer both the latent trajectory and the static
parameters (a, q) of a Gaussian random-walk SSM

    x_0 ~ N(0, q),   x_t ~ N(a x_{t-1}, q),   y_t ~ N(x_t, r),

by Gibbs sampling:  θ | x_{0:T}  (conjugate normal-inverse-gamma update from the
latent regression x_t on x_{t-1})  alternating with  x_{0:T} | θ  (one PGAS
iteration).  This demonstrates the compositional API: the PG kernel is one jitted
function of (key, model, state), so parameter updates slot between iterations.

Run:  python examples/pg_parameter_learning.py  [--particles 50] [--steps 150] [--iters 400]
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import advancedps_tpu as aps


def theta_update(key, x, r_prior_scale=10.0):
    """Conjugate draw of (a, q²) given the latent trajectory.

    Bayesian linear regression x_t = a x_{t-1} + N(0, q²) with the (improper)
    reference prior p(a, q²) ∝ 1/q²: posterior q² | x ~ InvGamma, a | q², x ~ N.
    """
    k_a, k_q = jax.random.split(key)
    xp, xc = x[:-1], x[1:]
    n = xp.shape[0]
    sxx = jnp.sum(xp * xp)
    a_hat = jnp.sum(xp * xc) / sxx
    resid = xc - a_hat * xp
    sse = jnp.sum(resid * resid)
    # q² ~ InvGamma((n-1)/2, sse/2): draw via gamma.
    q2 = (sse / 2.0) / jax.random.gamma(k_q, (n - 1) / 2.0)
    a = a_hat + jax.random.normal(k_a) * jnp.sqrt(q2 / sxx)
    return a, jnp.sqrt(q2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=50)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--iters", type=int, default=400)
    args = p.parse_args()

    true_a, true_q, r = 0.9, 0.32, 0.5
    true_model = aps.models.stationary_lgssm(a=true_a, q=true_q, r=r)
    xs, ys = aps.simulate(jax.random.key(1234), true_model, args.steps)

    def make_model(a, q):
        ssm = aps.StateSpaceModel(
            prior=aps.models.GaussianPrior(mu=0.0, sigma=q),
            dynamics=aps.models.LinearGaussianDynamics(a=a, b=0.0, q=q),
            observation=aps.models.LinearGaussianObservation(h=1.0, r=r),
        )
        return aps.TracedSSM(ssm, ys)

    sampler = aps.PGAS(args.particles)

    @jax.jit
    def gibbs_iter(key, a, q, state):
        k_pg, k_th = jax.random.split(key)
        smp, state = aps.step_pg(k_pg, make_model(a, q), sampler, state)
        a, q = theta_update(k_th, smp.trajectory)
        return a, q, state, smp.log_evidence

    key = jax.random.key(7)
    a, q = jnp.asarray(0.5), jnp.asarray(1.0)  # poor init
    state = None
    a_chain, q_chain = [], []
    t0 = time.perf_counter()
    for i in range(args.iters):
        k = jax.random.fold_in(key, i)
        if state is None:
            k_pg, k_th = jax.random.split(k)
            smp, state = aps.step_pg(k_pg, make_model(a, q), sampler, None)
            a, q = theta_update(k_th, smp.trajectory)
        else:
            a, q, state, _ = gibbs_iter(k, a, q, state)
        a_chain.append(float(a))
        q_chain.append(float(q))
    dt = time.perf_counter() - t0

    burn = args.iters // 2
    a_post = np.array(a_chain[burn:])
    q_post = np.array(q_chain[burn:])
    print(f"PGAS({args.particles}) + conjugate θ updates, {args.iters} Gibbs iters: "
          f"{dt:.1f}s ({args.iters/dt:.1f} it/s)")
    print(f"a: posterior mean {a_post.mean():.3f} ± {a_post.std():.3f}  (truth {true_a})")
    print(f"q: posterior mean {q_post.mean():.3f} ± {q_post.std():.3f}  (truth {true_q})")
    ok_a = abs(a_post.mean() - true_a) < 4 * a_post.std() + 0.05
    ok_q = abs(q_post.mean() - true_q) < 4 * q_post.std() + 0.05
    print("parameter recovery:", "OK" if (ok_a and ok_q) else "OFF")


if __name__ == "__main__":
    main()
