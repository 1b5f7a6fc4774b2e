from matdeeplearn_tpu.ops.segment import (  # noqa: F401
    gather,
    segment_count,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from matdeeplearn_tpu.ops.edge_basis import gaussian_basis  # noqa: F401
