from matdeeplearn_tpu.parallel.mesh import (  # noqa: F401
    dp_sharding,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
)
from matdeeplearn_tpu.parallel.spmd import (  # noqa: F401
    make_spmd_eval_epoch_fn,
    make_spmd_eval_step,
    make_spmd_train_epoch_fn,
    make_spmd_train_step,
    shard_ids,
)
