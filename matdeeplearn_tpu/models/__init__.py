"""Model zoo registry (reference: matdeeplearn/models/__init__.py exports
GCN, MPNN, SchNet, CGCNN, MEGNet, SOAP, SM; resolved by name via getattr in
training/training.py:250)."""

from matdeeplearn_tpu.models.cgcnn import CGCNN
from matdeeplearn_tpu.models.descriptor_nn import SM, SOAP
from matdeeplearn_tpu.models.gcn import GCN
from matdeeplearn_tpu.models.megnet import MEGNet
from matdeeplearn_tpu.models.mpnn import MPNN
from matdeeplearn_tpu.models.schnet import SchNet

MODEL_REGISTRY = {
    "CGCNN": CGCNN,
    "MPNN": MPNN,
    "SchNet": SchNet,
    "MEGNet": MEGNet,
    "GCN": GCN,
    "SM": SM,
    "SOAP": SOAP,
}

# Fields accepted by each model class (used to filter YAML hyperparams the
# way the reference forwards **kwargs into model ctors, training.py:250-252).
_COMMON = {
    "num_features", "dim1", "dim2", "pre_fc_count", "gc_count",
    "post_fc_count", "pool", "pool_order", "batch_norm", "batch_track_stats",
    "act", "dropout_rate", "output_dim", "edge_resolution", "edge_width",
    "precision", "remat",
}
MODEL_FIELDS = {
    "CGCNN": _COMMON,
    "GCN": _COMMON,
    # kernel: NNConv bilinear-message path ("auto"/"fused" = Pallas VMEM
    # kernel on TPU, "xla" = einsum) — layout-independent, so the model
    # resolves it itself rather than jobs.py's windowed-batching logic.
    "MPNN": _COMMON | {"dim3", "kernel"},
    "SchNet": _COMMON | {"dim3", "cutoff"},
    # ep_axis is injected by setup_run under ring-ep (mesh-derived, not a
    # YAML hyperparameter; setup_run keeps it out of checkpoint configs).
    "MEGNet": _COMMON | {"dim3", "gc_fc_count", "ep_axis"},
    "SM": {"dim1", "fc_count", "output_dim", "precision"},
    "SOAP": {"dim1", "fc_count", "output_dim", "precision"},
}


def build_model(name: str, dataset, hyperparams: dict):
    """Instantiate a model by registry name with dataset-derived dims.

    Mirrors model_setup's reflection (training/training.py:250-252) but with
    explicit dataset-derived num_features/output_dim instead of a live
    `data` object. String booleans ("True"/"False") are coerced, matching
    the reference's YAML convention.
    """
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model '{name}'; have {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    fields = MODEL_FIELDS[name]
    kwargs = {}
    for k, v in (hyperparams or {}).items():
        if k not in fields:
            continue
        if k in ("batch_norm", "batch_track_stats", "remat") and isinstance(v, str):
            v = v == "True"
        if k == "precision":
            v = str(v).lower()
            if v not in ("f32", "bf16"):
                raise ValueError(
                    f"precision must be 'f32' or 'bf16', got {v!r}"
                )
        kwargs[k] = v
    kwargs.setdefault("output_dim", dataset.output_dim)
    if name not in ("SM", "SOAP"):
        kwargs.setdefault("num_features", dataset.num_features)
        kwargs.setdefault("edge_resolution", dataset.num_edge_features)
        kwargs.setdefault("edge_width", getattr(dataset, "edge_width", 0.2))
    return cls(**kwargs)
