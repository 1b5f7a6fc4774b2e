"""Mesh-enabled job modes (Repeat/CV/Ensemble) and streaming × SPMD on the
8-device virtual CPU mesh: reference `parallel: "True"` covers all training
run modes via DDP (training/training.py:719-843, 587-715, 1069-1196); here
the same coverage rides one (dp, ep) mesh with compiled programs shared
across trials/folds."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matdeeplearn_tpu.data import BatchSpec
from matdeeplearn_tpu.data.streaming import load_or_create_sharded
from matdeeplearn_tpu.models import build_model
from matdeeplearn_tpu.parallel import make_mesh
from matdeeplearn_tpu.parallel.spmd import (
    ShardedStream,
    make_spmd_batch_eval_step,
    make_spmd_batch_train_step,
)
from matdeeplearn_tpu.training import train as T
from matdeeplearn_tpu.training.optimizers import build_optimizer
from matdeeplearn_tpu.training.stream import (
    make_batch_eval_step,
    make_batch_train_step,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


@pytest.fixture(scope="module")
def sds(toy_dataset, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pjshards"))
    return load_or_create_sharded(toy_dataset, path, 0, 5)


@pytest.fixture()
def jobdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


MODEL_PARAMS = {
    "model": "CGCNN", "dim1": 10, "dim2": 10, "gc_count": 1,
    "post_fc_count": 1, "epochs": 3, "lr": 0.01, "batch_size": 4,
    "optimizer": "AdamW", "print_model": False,
    "scheduler": "ReduceLROnPlateau",
    "scheduler_args": {"factor": 0.8, "patience": 2},
}
TRAIN_PARAMS = {"loss": "l1_loss", "train_ratio": 0.7, "val_ratio": 0.15,
                "test_ratio": 0.15, "verbosity": 0}


def _stream_setup(toy_dataset, sds, mesh, dp, bs_per_replica=2):
    model = build_model(
        "CGCNN", sds,
        {"dim1": 12, "dim2": 12, "gc_count": 2, "post_fc_count": 1,
         "batch_norm": False},
    )
    spec = BatchSpec.for_dataset(
        sds.node_counts(), sds.edge_counts(), bs_per_replica
    )
    tx = build_optimizer("SGD", 0.1, {})
    sample = sds.assemble(np.arange(bs_per_replica, dtype=np.int32), spec)
    state = T.init_state(model, tx, sample, 0)
    return model, spec, tx, state


def test_stream_spmd_step_equals_concatenated_batch(toy_dataset, sds,
                                                    eight_devices):
    """BN off: the sharded host-fed step must produce the same loss and
    updated params as the single-device step on the concatenated batch —
    exact DDP-averaging semantics for the streaming path."""
    dp = 4
    mesh = make_mesh(dp=dp, ep=2, devices=eight_devices)
    model, spec, tx, state = _stream_setup(toy_dataset, sds, mesh, dp)

    sstream = ShardedStream(sds, mesh)
    step = make_spmd_batch_train_step(model, tx, "l1_loss", mesh)
    ids = np.arange(8, dtype=np.int32)
    batch = sstream.assemble(ids, spec)
    new_state, loss, count = step(state, batch, jax.random.PRNGKey(0))
    assert float(count) == 8

    spec1 = BatchSpec.for_dataset(sds.node_counts(), sds.edge_counts(), 8)
    ref_step = make_batch_train_step(model, tx, "l1_loss")
    ref_batch = sds.assemble(ids, spec1)
    ref_state, ref_loss, _ = ref_step(state, ref_batch, jax.random.PRNGKey(0))

    assert abs(float(loss) - float(ref_loss)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stream_spmd_eval_preserves_id_order(toy_dataset, sds, eight_devices):
    """Flattened (dp, B) eval outputs must line up with the flat id vector,
    including tail -1 padding."""
    dp = 4
    mesh = make_mesh(dp=dp, ep=1, devices=eight_devices[:4])
    model, spec, tx, state = _stream_setup(toy_dataset, sds, mesh, dp, 3)

    sstream = ShardedStream(sds, mesh)
    estep = make_spmd_batch_eval_step(model, "l1_loss", mesh)
    ids = np.concatenate([np.arange(10), -np.ones(2)]).astype(np.int32)
    loss, count, outs = estep(state, sstream.assemble(ids, spec))
    assert float(count) == 10
    assert outs.shape[0] == 12

    ref_step = make_batch_eval_step(model, "l1_loss")
    flat = np.asarray(outs)
    for k, gid in enumerate(ids[:10]):
        one = sds.assemble(
            np.array([gid, -1, -1], np.int32), spec
        )
        _, _, ref_out = ref_step(state, one)
        np.testing.assert_allclose(flat[k], np.asarray(ref_out)[0], atol=1e-5)


def test_train_regular_streaming_spmd(sds, jobdir, eight_devices):
    """End-to-end Training run mode with dataset_type='large' under a mesh
    (VERDICT r1 #6: streaming and SPMD must compose)."""
    from matdeeplearn_tpu.training import train_regular

    mesh = make_mesh(dp=2, ep=1, devices=eight_devices[:2])
    errors = train_regular(
        sds,
        {"job_name": "stsp", "seed": 3, "save_model": "True",
         "model_path": str(jobdir / "stsp.ckpt"), "write_output": "True"},
        TRAIN_PARAMS, MODEL_PARAMS, mesh=mesh,
    )
    for split in ("train", "val", "test"):
        assert np.isfinite(errors[split]), split
    assert os.path.exists(jobdir / "stsp.ckpt")
    assert os.path.exists(jobdir / "stsp_test_outputs.csv")


def test_reset_run_matches_fresh_setup(toy_dataset):
    """reset_run must reproduce exactly the state a fresh setup_run would
    give for the same seed (compiled-program reuse can't drift params)."""
    from matdeeplearn_tpu.training.jobs import reset_run, setup_run

    run_a = setup_run(toy_dataset, dict(MODEL_PARAMS), "l1_loss", seed=5)
    run_b = setup_run(toy_dataset, dict(MODEL_PARAMS), "l1_loss", seed=9)
    reset_run(run_b, 5)
    for a, b in zip(
        jax.tree_util.tree_leaves(run_a.state.params),
        jax.tree_util.tree_leaves(run_b.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # scheduler state is rebuilt, not carried over
    assert run_b.scheduler.lr == run_a.scheduler.lr


def test_train_repeat_with_mesh(toy_dataset, jobdir, eight_devices):
    from matdeeplearn_tpu.training import train_repeat

    mesh = make_mesh(dp=2, ep=1, devices=eight_devices[:2])
    errs = train_repeat(
        toy_dataset,
        {"job_name": "rpm", "repeat_trials": 2, "model_path": "rpm.ckpt",
         "write_output": "False", "seed": 0},
        TRAIN_PARAMS, MODEL_PARAMS, mesh=mesh,
    )
    assert errs.shape == (2, 3)
    assert np.isfinite(errs).all()
    assert os.path.exists("rpm_all_errorvalues.csv")


def test_train_cv_with_mesh(toy_dataset, jobdir, eight_devices):
    from matdeeplearn_tpu.training import train_CV

    mesh = make_mesh(dp=2, ep=1, devices=eight_devices[:2])
    cv_err = train_CV(
        toy_dataset,
        {"job_name": "cvm", "cv_folds": 2, "write_output": "True", "seed": 1},
        TRAIN_PARAMS, MODEL_PARAMS, mesh=mesh,
    )
    assert np.isfinite(cv_err)
    assert os.path.exists("cvm_CV_outputs.csv")


def test_train_ensemble_with_mesh(toy_dataset, jobdir, eight_devices):
    from matdeeplearn_tpu.training import train_ensemble

    mesh = make_mesh(dp=2, ep=1, devices=eight_devices[:2])
    mp = dict(MODEL_PARAMS)
    err = train_ensemble(
        toy_dataset,
        {"job_name": "ensm", "ensemble_list": "CGCNN_demo,GCN_demo",
         "write_output": "Partial", "save_model": "False",
         "model_path": "ens.ckpt", "seed": 2},
        TRAIN_PARAMS,
        {"CGCNN_demo": mp,
         "GCN_demo": {**mp, "model": "GCN"}},
        mesh=mesh,
    )
    assert np.isfinite(err)


def test_windowed_kernel_under_mesh(toy_dataset, jobdir, eight_devices):
    """kernel=pallas now composes with a dp-only mesh (VERDICT r1 #4): the
    shard_map body runs one plain per-replica program per device, so the
    Pallas windowed aggregation needs no vmap lowering. Errors must match
    the same run on the XLA kernel to float tolerance."""
    from matdeeplearn_tpu.training import train_regular

    mesh = make_mesh(dp=2, ep=1, devices=eight_devices[:2])
    mp = {**MODEL_PARAMS, "kernel": "pallas", "batch_norm": False}
    errors = train_regular(
        toy_dataset,
        {"job_name": "wm", "seed": 6, "save_model": "False",
         "write_output": "False"},
        TRAIN_PARAMS, mp, mesh=mesh,
    )
    ref = train_regular(
        toy_dataset,
        {"job_name": "wmx", "seed": 6, "save_model": "False",
         "write_output": "False"},
        TRAIN_PARAMS, {**mp, "kernel": "xla"}, mesh=mesh,
    )
    for split in ("train", "val", "test"):
        assert np.isfinite(errors[split])
        assert abs(errors[split] - ref[split]) < 5e-4, split


def test_train_regular_streaming_packed_spmd(sds, jobdir, eight_devices):
    """Streaming × packed × dp mesh: host packs per-replica bins from
    shard-local orders; the SPMD batch-fed step consumes the (dp, B)
    stacked pytree."""
    from matdeeplearn_tpu.training import train_regular

    mesh = make_mesh(dp=2, ep=1, devices=eight_devices[:2])
    errors = train_regular(
        sds,
        {"job_name": "stpkm", "seed": 5, "save_model": "False",
         "write_output": "False"},
        TRAIN_PARAMS,
        {**MODEL_PARAMS, "batch_size": 4, "batching": "packed"},
        mesh=mesh,
    )
    for split in ("train", "val", "test"):
        assert np.isfinite(errors[split]), split
