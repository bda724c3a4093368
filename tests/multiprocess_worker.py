"""Worker for the spawned 2-process CPU-mesh test (tests/test_multiprocess.py).

Each process contributes 4 virtual CPU devices to an 8-device global mesh via
``jax.distributed.initialize`` (+ gloo CPU collectives), runs the SAME
conditional sharded sweep with PGAS ancestor sampling that the single-process
tests pin, and prints one JSON line of replicated outputs.  The parent
asserts (a) both processes print identical values and (b) they match the
in-process single-chip sweep.

Invoked: python multiprocess_worker.py <process_id> <num_processes> <port>
(env must already carry JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4).
"""

import json
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    from advancedps_tpu.parallel.mesh import init_distributed

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())

    import jax.numpy as jnp

    import advancedps_tpu as aps
    from advancedps_tpu.engine import sweep
    from advancedps_tpu.parallel import particle_mesh, sharded_sweep
    from advancedps_tpu.smc import SSMKernel

    T, N = 10, 512
    model = aps.models.stationary_lgssm(a=0.9, q=0.32, r=1.0)
    _, ys = aps.simulate(jax.random.key(0), model, T)
    kernel = SSMKernel(ssm=aps.TracedSSM(model, ys))
    gated = aps.PGAS(N).resampler  # always-resample, the PGAS default
    ref = jnp.linspace(-0.5, 0.5, T)
    key = jax.random.key(3)

    mesh = particle_mesh()  # all global devices, spanning both processes
    res = sharded_sweep(
        key, kernel, N, gated, mesh, ref=ref, ancestor_sampling=True,
        store_states=False,
    )
    # Single-chip oracle computed ON THIS PROCESS's default device: the
    # sharded result must match it (same positional randomness contract as
    # the single-process mesh tests).
    single = sweep(key, kernel, N, gated, ref=ref, ancestor_sampling=True,
                   store_states=False)

    out = {
        "process": pid,
        "n_global_devices": n_global,
        "log_z": float(res.log_evidence),
        "log_z_single": float(single.log_evidence),
        "ess": [round(float(e), 4) for e in res.ess],
        "resampled": [bool(b) for b in res.resampled],
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
