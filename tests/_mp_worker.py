"""Worker process for the 2-process jax.distributed bring-up test.

Run as: python tests/_mp_worker.py <rank> <nproc> <coordinator>

Forces the CPU backend with 2 local devices, joins the process group via
splatloam_tpu.parallel.initialize_distributed (SURVEY §2.4 distributed-
backend row: the DCN/multi-host analog, exercised here over gRPC+Gloo on
localhost), builds the (data=2, model=2) mesh ACROSS the two processes
(the "data" axis spans processes, "model" stays process-local), runs one
sharded_train_step on the same tiny scene test_parallel.py uses, and
prints the resulting loss + updated state slices as one JSON line for the
driving pytest to compare against its single-device reference.
"""
import json
import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(_flags)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    rank, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from splatloam_tpu.parallel import initialize_distributed, make_mesh
    initialize_distributed(coord, nproc, rank)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    from splatloam_tpu.model import surfels as S
    from splatloam_tpu.ops.rasterizer import RenderParams
    from splatloam_tpu.parallel import sharded_train_step

    # identical scene in both processes (same seed as the driver)
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    import test_parallel as tp

    rng = np.random.default_rng(0)
    surf, adam, K, T_cw, depth, valid = tp._setup(rng)
    hyper = S.AdamHyper()

    mesh = make_mesh(data=2, model=2)
    params = RenderParams(height=tp.H, width=tp.W, backend="jnp")
    step = sharded_train_step(mesh, params, hyper,
                              lambda_alpha=0.1, lambda_normal=0.1,
                              scaling_max=0.5, scaling_max_penalty=0.2)

    # host-local -> global arrays: surfel/Adam leaves are replicated over
    # the cross-process "data" axis and sharded over the process-local
    # "model" axis, so every process supplies the full array; the
    # range-image rows split across processes (each supplies its half).
    def to_global(tree, spec):
        return jax.tree_util.tree_map(
            lambda x: mhu.host_local_array_to_global_array(
                np.asarray(x), mesh, spec), tree)

    surf_g = S.Surfels(params=to_global(surf.params, P("model")),
                       active=to_global(surf.active, P("model")))
    adam_g = S.AdamState(mu=to_global(adam.mu, P("model")),
                         nu=to_global(adam.nu, P("model")),
                         step=to_global(adam.step, P()))
    rows = tp.H // 2
    depth_l = np.asarray(depth)[rank * rows:(rank + 1) * rows]
    valid_l = np.asarray(valid)[rank * rows:(rank + 1) * rows]
    depth_g = mhu.host_local_array_to_global_array(depth_l, mesh,
                                                   P("data"))
    valid_g = mhu.host_local_array_to_global_array(valid_l, mesh,
                                                   P("data"))
    K_g = to_global(jnp.asarray(K), P())
    T_g = to_global(jnp.asarray(T_cw), P())

    new_surf, new_adam, loss = step(surf_g, adam_g, K_g, T_g, depth_g,
                                    valid_g)

    # bring the (data-replicated, model-sharded) results host-local
    xyz = mhu.global_array_to_host_local_array(new_surf.params.xyz, mesh,
                                               P("model"))
    mu = mhu.global_array_to_host_local_array(new_adam.mu.xyz, mesh,
                                              P("model"))
    out = {
        "rank": rank,
        "processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "loss": float(np.asarray(loss)),
        "xyz_head": np.asarray(xyz)[:8].tolist(),
        "mu_head": np.asarray(mu)[:8].tolist(),
        "adam_step": int(np.asarray(
            mhu.global_array_to_host_local_array(new_adam.step, mesh,
                                                 P()))),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
