"""Distributed GP MLE over a device mesh.

Demonstrates the capability the reference cannot offer (its fit is a
single-process LAPACK loop, crates/gp/src/algorithm.rs:879-1056): the
likelihood AND its analytic gradient evaluated on block-cyclic row shards
(parallel/dist_fit.py), so no single device ever holds the (n, n)
factorization during optimization.

Runs on a virtual 8-device CPU mesh out of the box; on a real TPU pod
slice, replace the mesh with `make_mesh(len(jax.devices()))` and scale n.

    python examples/distributed_fit.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egobox_tpu.gp.fit import fit_gp  # noqa: E402
from egobox_tpu.parallel import fit_theta_distributed, make_mesh  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n, d = 512, 4
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3.0 * x[:, 0]) + x[:, 1] ** 2 + 0.2 * x[:, 2] * x[:, 3]

    mesh = make_mesh(8, axis="rows")

    # raw theta path: subsample warm start + distributed L-BFGS polish
    theta, res = fit_theta_distributed(
        mesh, x, y[:, None], max_iters=20,
        subsample_warmstart=128, polish_iters=10,
    )
    print("distributed theta:", np.asarray(theta))
    print("neg reduced likelihood:", float(res.fun))

    # full model path: the MLE runs distributed, the predict state is
    # assembled once at the optimized theta
    model = fit_gp(x, y, mesh=mesh, n_start=0, max_iters=20)
    print("fit_gp(mesh=...) theta:", np.asarray(model.theta))
    print("likelihood:", float(model.likelihood))


if __name__ == "__main__":
    main()
