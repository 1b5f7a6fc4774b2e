from matdeeplearn_tpu.nn.layers import (  # noqa: F401
    ACTIVATIONS,
    GRUCell,
    Linear,
    LSTMCell,
    MaskedBatchNorm,
    MLP,
    get_activation,
    shifted_softplus,
    torch_linear_init,
)
from matdeeplearn_tpu.nn.conv import (  # noqa: F401
    CGConv,
    GCNConv,
    MEGNetBlock,
    MEGNetMLP,
    NNConv,
    SchNetInteraction,
)
from matdeeplearn_tpu.nn.pool import (  # noqa: F401
    POOLS,
    Set2Set,
    get_pool,
    global_add_pool,
    global_max_pool,
    global_mean_pool,
)
