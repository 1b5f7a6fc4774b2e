from matdeeplearn_tpu.training.train import (  # noqa: F401
    LOSSES,
    TrainState,
    evaluate,
    get_loss,
    init_state,
    make_eval_step,
    make_train_step,
    train_epoch,
    trainer,
)
from matdeeplearn_tpu.training.optimizers import (  # noqa: F401
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from matdeeplearn_tpu.training.scheduler import (  # noqa: F401
    ConstantLR,
    ReduceLROnPlateau,
    build_scheduler,
)
from matdeeplearn_tpu.training.checkpoint import (  # noqa: F401
    load_checkpoint,
    params_from_raw,
    save_checkpoint,
)
from matdeeplearn_tpu.training.jobs import (  # noqa: F401
    analysis,
    predict,
    setup_run,
    train_CV,
    train_ensemble,
    train_regular,
    train_repeat,
)
