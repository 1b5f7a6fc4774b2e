"""remat=True (gradient checkpointing around conv blocks) — forward/grads
identical to the non-remat model; memory saving is a TPU-side property."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.data.batching import BatchSpec, DeviceDataset
from matdeeplearn_tpu.models import build_model
from matdeeplearn_tpu.training import train as T

MODELS = ["CGCNN", "MPNN", "SchNet", "MEGNet", "GCN"]


def _batch(ds, n=8):
    spec = BatchSpec.for_dataset(ds.node_counts(), ds.edge_counts(), n)
    data = DeviceDataset.from_graph_dataset(ds)
    ids = jnp.asarray(np.arange(min(n, len(ds)), dtype=np.int32))
    ids = jnp.pad(ids, (0, spec.num_graphs - ids.shape[0]), constant_values=-1)
    return T.assemble_batch(data, ids, spec)


@pytest.mark.parametrize("model_name", MODELS)
def test_remat_matches_plain(toy_dataset, model_name):
    batch = _batch(toy_dataset)
    cfg = {"model": model_name, "dim1": 12, "dim2": 12, "dim3": 12,
           "gc_count": 2, "post_fc_count": 1}
    plain = build_model(model_name, toy_dataset, cfg)
    rem = build_model(model_name, toy_dataset, {**cfg, "remat": "True"})
    v = plain.init(jax.random.PRNGKey(0), batch, training=False)

    out_p = plain.apply(v, batch, training=False)
    out_r = rem.apply(v, batch, training=False)  # identical param tree
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, training=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out ** 2)

    gp = jax.grad(lambda p: loss(plain, p))(v["params"])
    gr = jax.grad(lambda p: loss(rem, p))(v["params"])
    # atol 1e-5: recomputation reorders float reductions (observed 1.4e-6
    # single-element drift on MEGNet's in-block BN), not a semantic diff.
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
