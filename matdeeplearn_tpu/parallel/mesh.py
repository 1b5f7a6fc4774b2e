"""Device mesh construction.

The reference's only scaling strategy is single-host DDP over NCCL
(training/training.py:227-237, main.py:274-285). The TPU-native equivalent
is a jax.sharding.Mesh with two axes:

  dp — data parallelism over graphs (the DDP analog; gradients combine via
       XLA collectives over ICI instead of NCCL ring all-reduce)
  ep — edge parallelism: the padded edge dimension of each batch is sharded
       so message/filter MLPs (the FLOP-dominant work) split across chips —
       the graph analog of tensor/sequence parallelism (SURVEY.md §2.4).

Multi-host: jax.distributed.initialize() makes jax.devices() span hosts;
the same mesh code then lays dp over the DCN axis automatically.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed for multi-host (DCN) runs.

    The reference is hard-wired single-host (MASTER_ADDR=localhost,
    training/training.py:230-231). Here multi-host needs only the standard
    JAX coordination environment (set by TPU pod launchers, or
    JAX_COORDINATOR_ADDRESS/JAX_PROCESS_ID/JAX_NUM_PROCESSES manually);
    after initialize(), jax.devices() spans hosts and make_mesh lays dp
    across the DCN axis with no further changes. No-op (returns False)
    when no coordination env is present, so single-host runs never pay for
    a rendezvous."""
    import os

    env = os.environ
    present = any(
        k in env
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if not present:
        return False
    # Manual topology (non-TPU-pod launchers, CPU integration tests): pass
    # the explicit rendezvous triple when the env spells it out;
    # jax.distributed.initialize() auto-detects the rest (SLURM, TPU pods).
    kwargs = {}
    addr = env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS")
    if addr and env.get("JAX_NUM_PROCESSES") and env.get("JAX_PROCESS_ID"):
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(env["JAX_NUM_PROCESSES"]),
            process_id=int(env["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
        if verbose:
            print(
                f"jax.distributed initialized: process "
                f"{jax.process_index()}/{jax.process_count()}"
            )
        return True
    except Exception as e:  # rendezvous failure: fall back to single host
        if verbose:
            print(f"jax.distributed.initialize failed ({e}); single-host run")
        return False


def make_mesh(dp: int | None = None, ep: int = 1, devices=None) -> Mesh:
    """Build a (dp, ep) mesh. dp=None uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % ep == 0, f"{n} devices not divisible by ep={ep}"
        dp = n // ep
    assert dp * ep <= n, f"need {dp * ep} devices, have {n}"
    arr = np.array(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(arr, axis_names=("dp", "ep"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over dp (per-replica batches)."""
    return NamedSharding(mesh, P("dp"))
