"""Worker for the real 2-process jax.distributed integration test
(tests/test_multihost.py::test_two_process_distributed_training_step).

Each process contributes 2 virtual CPU devices; after the rendezvous the
global mesh spans 4 devices across 2 processes. One real SPMD train step
runs through the production setup_run/train_step path, and the
process-0-only write discipline is asserted on a shared workdir.

Usage: python multihost_worker.py <port> <process_id> <workdir>
"""

import os
import sys

port, pid, workdir = sys.argv[1], sys.argv[2], sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = pid

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
os.chdir(workdir)

import numpy as np  # noqa: E402

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# force the CPU backend the same way tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from matdeeplearn_tpu.parallel import make_mesh, maybe_initialize_distributed

    assert maybe_initialize_distributed(verbose=True) is True
    # Device visibility spans processes: 2 local, 4 global.
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4
    me = jax.process_index()

    mesh = make_mesh(dp=4, ep=1)

    from __graft_entry__ import _synthetic_dataset
    from matdeeplearn_tpu.training import jobs as J

    ds = _synthetic_dataset(num_graphs=32, seed=1, min_atoms=4, max_atoms=8,
                            max_neighbors=6)
    mp = {"model": "CGCNN", "dim1": 8, "dim2": 8, "gc_count": 1,
          "post_fc_count": 1, "batch_size": 4, "epochs": 1, "lr": 0.01,
          "optimizer": "AdamW", "scheduler": "ReduceLROnPlateau"}
    run = J.setup_run(ds, mp, "l1_loss", seed=0, mesh=mesh, print_model=False)

    # Multi-controller: place the (process-identical) inputs as global
    # arrays — replicated state/data, dp-sharded ids.
    rep = NamedSharding(mesh, P())
    state = jax.device_put(jax.tree.map(np.asarray, run.state), rep)
    data = jax.device_put(jax.tree.map(np.asarray, run.data), rep)
    ids = jax.device_put(np.arange(16, dtype=np.int32),
                         NamedSharding(mesh, P("dp")))
    rng = jax.device_put(np.asarray(jax.random.PRNGKey(0)), rep)

    new_state, loss, count = run.train_step(state, data, ids, rng)
    loss = float(loss)
    count = float(count)
    assert np.isfinite(loss), loss
    assert count == 16.0, count
    # parameters actually moved
    d0 = jax.tree.leaves(state.params)[0]
    d1 = jax.tree.leaves(new_state.params)[0]
    assert float(jnp.max(jnp.abs(d1 - d0))) > 0

    # ---- process-0-only write discipline on the SHARED workdir ----
    from jax.experimental import multihost_utils

    from matdeeplearn_tpu.training.checkpoint import save_checkpoint
    from matdeeplearn_tpu.utils.results import write_results

    host_state = jax.tree.map(np.asarray, new_state)
    # every process calls the writers with the same paths...
    write_results(["s0"], np.ones(1), np.ones(1), "gate_outputs.csv")
    save_checkpoint("gate_model.ckpt", host_state, run.scheduler,
                    run.model_name, run.model_config)
    # ...and a process-tagged path that must only appear for process 0
    write_results(["s0"], np.ones(1), np.ones(1), f"proc{me}_tag.csv")
    multihost_utils.sync_global_devices("writes_done")
    assert os.path.exists("gate_outputs.csv")
    assert os.path.exists("gate_model.ckpt")
    assert os.path.exists("proc0_tag.csv")
    assert not os.path.exists("proc1_tag.csv"), \
        "process 1 wrote output — rank gate broken"

    print(f"WORKER_OK process={me} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
