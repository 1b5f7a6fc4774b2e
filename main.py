"""matdeeplearn_tpu CLI — config merge + run-mode dispatch.

Mirrors the reference's main.py (argparse flags override YAML; the Job
section is keyed by run mode and Models by model name; seed 0 draws a
random seed; settings dumped to <job>_settings.txt — main.py:27-221).
Device dispatch differs: instead of CPU/1-GPU/mp.spawn DDP
(main.py:274-285), the `parallel` flag builds a jax.sharding.Mesh over all
visible TPU chips and runs the SPMD step (matdeeplearn_tpu/parallel/).
"""

from __future__ import annotations

import argparse
import json
import os
import pprint
import sys
import time

import numpy as np
import yaml

# Honor an explicit JAX_PLATFORMS before any backend initialization. Some
# environments install a sitecustomize that force-selects a TPU platform
# regardless of the env var; pinning via jax.config restores the documented
# behavior (e.g. JAX_PLATFORMS=cpu for host-only runs).
if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="MatDeepLearn-TPU inputs")
    # Job arguments
    parser.add_argument("--config_path", default="config.yml", type=str)
    parser.add_argument("--run_mode", default=None, type=str,
                        help="Training, Predict, Repeat, CV, Hyperparameter, Ensemble, Analysis")
    parser.add_argument("--job_name", default=None, type=str)
    parser.add_argument("--model", default=None, type=str,
                        help="CGCNN_demo, MPNN_demo, SchNet_demo, MEGNet_demo, GCN_demo, SOAP_demo, SM_demo")
    parser.add_argument("--seed", default=None, type=int, help="seed for data split, 0=random")
    parser.add_argument("--model_path", default=None, type=str)
    parser.add_argument("--save_model", default=None, type=str)
    parser.add_argument("--load_model", default=None, type=str)
    parser.add_argument("--write_output", default=None, type=str)
    parser.add_argument("--parallel", default=None, type=str,
                        help="Use multi-chip SPMD if more than one device is visible")
    parser.add_argument("--ep", default=1, type=int,
                        help="Edge-parallel mesh axis size: each group of ep "
                             "devices splits every batch's edge slots and "
                             "halo-exchanges boundary-node sums (dp = "
                             "n_devices/ep). Models may set ep_impl: gspmd "
                             "to use XLA auto-partitioning instead of the "
                             "ring exchange.")
    parser.add_argument("--reprocess", default=None, type=str)
    parser.add_argument("--profile", default=None, type=str,
                        help="True = write a jax.profiler trace for the run")
    # Processing arguments
    parser.add_argument("--data_path", default=None, type=str)
    parser.add_argument("--format", default=None, type=str)
    # Training arguments
    parser.add_argument("--train_ratio", default=None, type=float)
    parser.add_argument("--val_ratio", default=None, type=float)
    parser.add_argument("--test_ratio", default=None, type=float)
    parser.add_argument("--verbosity", default=None, type=int)
    parser.add_argument("--target_index", default=None, type=int)
    # Model arguments
    parser.add_argument("--epochs", default=None, type=int)
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--lr", default=None, type=float)
    parser.add_argument("--kernel", default=None, type=str,
                        choices=["auto", "csr", "fused", "pallas", "xla"],
                        help="conv kernel path override (see config.yml "
                             "Models notes)")
    parser.add_argument("--batching", default=None, type=str,
                        choices=["padded", "packed"],
                        help="padded|packed (budget-packed batches)")
    return parser


def load_config(args) -> dict:
    assert os.path.exists(args.config_path), (
        "Config file not found in " + args.config_path
    )
    with open(args.config_path) as f:
        config = yaml.safe_load(f)

    if args.run_mode is not None:
        config["Job"]["run_mode"] = args.run_mode
    run_mode = config["Job"].get("run_mode")
    config["Job"] = config["Job"].get(run_mode)
    if config["Job"] is None:
        print("Invalid run mode")
        sys.exit(1)
    config["Job"]["run_mode"] = run_mode

    for key in ("job_name", "model", "seed", "model_path", "load_model",
                "save_model", "write_output", "parallel", "reprocess",
                "profile"):
        v = getattr(args, key, None)
        if v is not None:
            config["Job"][key] = v
    if args.data_path is not None:
        config["Processing"]["data_path"] = args.data_path
    if args.format is not None:
        config["Processing"]["data_format"] = args.format
    for key in ("train_ratio", "val_ratio", "test_ratio", "verbosity", "target_index"):
        v = getattr(args, key, None)
        if v is not None:
            config["Training"][key] = v
    for mkey in config["Models"]:
        for key in ("epochs", "batch_size", "lr", "kernel", "batching"):
            v = getattr(args, key, None)
            if v is not None:
                config["Models"][mkey][key] = v

    if run_mode == "Predict":
        config["Models"] = {}
    elif run_mode == "Ensemble":
        ens = config["Job"]["ensemble_list"]
        if isinstance(ens, str):
            ens = ens.split(",")
        config["Job"]["ensemble_list"] = ens
        config["Models"] = {name: config["Models"].get(name) for name in ens}
    else:
        config["Models"] = config["Models"].get(config["Job"]["model"])

    if config["Job"].get("seed", 0) == 0:
        config["Job"]["seed"] = int(np.random.randint(1, 1e6))
    return config


def main(argv=None):
    start_time = time.time()
    print("Starting...")

    args = build_parser().parse_args(argv)
    config = load_config(args)
    run_mode = config["Job"]["run_mode"]

    import jax

    # Persistent XLA compilation cache: whole-epoch scanned programs are
    # expensive to compile (minutes behind the TPU tunnel); cache them on
    # disk so reruns with the same shapes start in seconds. Override the
    # location with MDL_COMPILE_CACHE, or disable with MDL_COMPILE_CACHE=0.
    cache_dir = os.environ.get(
        "MDL_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    if cache_dir and cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from matdeeplearn_tpu.parallel import make_mesh, maybe_initialize_distributed

    maybe_initialize_distributed()
    devices = jax.devices()
    print("Devices available:", devices)

    from matdeeplearn_tpu.data import get_dataset
    from matdeeplearn_tpu.training import (
        analysis,
        predict,
        train_CV,
        train_ensemble,
        train_regular,
        train_repeat,
    )
    from matdeeplearn_tpu.training import hyper as H

    print("Settings: ")
    pprint.pprint(config)
    with open(str(config["Job"]["job_name"]) + "_settings.txt", "w") as log_file:
        pprint.pprint(config, log_file)

    mesh = None
    if (
        str(config["Job"].get("parallel", "False")) == "True"
        and len(devices) > 1
        and run_mode in ("Training", "Repeat", "CV", "Ensemble")
    ):
        ep = max(1, int(getattr(args, "ep", 1) or 1))
        assert len(devices) % ep == 0, (
            f"--ep={ep} does not divide the {len(devices)} visible devices"
        )
        mesh = make_mesh(dp=len(devices) // ep, ep=ep)
        print(f"Using SPMD mesh: dp={len(devices) // ep}, ep={ep}")

    dataset = None
    if run_mode != "Hyperparameter":
        t0 = time.time()
        dataset = get_dataset(
            config["Processing"]["data_path"],
            config["Training"]["target_index"],
            config["Job"].get("reprocess", "False"),
            config["Processing"],
        )
        print(
            f"Dataset used: {len(dataset)} graphs, {dataset.num_features} node"
            f" features, {dataset.num_edge_features} edge features"
        )
        print("--- %s seconds for processing ---" % (time.time() - t0))

    if run_mode == "Training":
        print("Starting regular training")
        train_regular(
            dataset, config["Job"], config["Training"], config["Models"], mesh=mesh
        )
    elif run_mode == "Predict":
        print("Starting prediction from trained model")
        predict(dataset, config["Training"]["loss"], config["Job"])
    elif run_mode == "Repeat":
        print("Repeat training for " + str(config["Job"]["repeat_trials"]) + " trials")
        train_repeat(
            dataset, config["Job"], config["Training"], config["Models"], mesh=mesh
        )
    elif run_mode == "CV":
        print("Starting cross validation")
        train_CV(
            dataset, config["Job"], config["Training"], config["Models"], mesh=mesh
        )
    elif run_mode == "Ensemble":
        print("Starting ensemble training")
        train_ensemble(
            dataset, config["Job"], config["Training"], config["Models"], mesh=mesh
        )
    elif run_mode == "Analysis":
        print("Starting analysis of graph features")
        tsne_args = {
            "perplexity": 50, "early_exaggeration": 12, "learning_rate": 300,
            "n_iter": 5000, "verbose": 1, "random_state": 42,
        }
        analysis(dataset, config["Job"]["model_path"], tsne_args)
    elif run_mode == "Hyperparameter":
        print("Starting hyperparameter optimization")
        print(
            "running for "
            + str(config["Models"]["epochs"])
            + " epochs on "
            + str(config["Job"]["model"])
            + " model"
        )
        data_path = config["Processing"]["data_path"]
        if str(config["Job"].get("reprocess", "False")) == "False":
            dataset = get_dataset(
                data_path,
                config["Training"]["target_index"],
                "False",
                config["Processing"],
            )
        space = H.default_search_space(config["Job"]["model"], config["Processing"])
        best = H.tune_setup(
            space, config["Job"], config["Processing"], config["Training"],
            config["Models"], data_path=data_path, dataset=dataset,
        )
        hyperparameters = {
            k: round(v, 6) if isinstance(v, float) else v
            for k, v in best["config"].items()
        }
        with open(
            config["Job"]["job_name"] + "_optimized_hyperparameters.json",
            "w", encoding="utf-8",
        ) as f:
            json.dump(hyperparameters, f, ensure_ascii=False, indent=4)
        print("Best hyperparameters written")
    else:
        print("No valid mode selected, try again")

    print("--- %s total seconds elapsed ---" % (time.time() - start_time))


if __name__ == "__main__":
    main()
