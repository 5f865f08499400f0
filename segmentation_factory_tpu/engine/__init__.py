from segmentation_factory_tpu.engine.optimizers import (  # noqa: F401
    adamp,
    sgdp,
)
from segmentation_factory_tpu.engine.state import (  # noqa: F401
    OPTIMIZERS,
    TrainState,
    create_optimizer,
    create_train_state,
    recalibrate_bn,
    set_plateau_lr,
)
from segmentation_factory_tpu.engine.steps import (  # noqa: F401
    compute_loss,
    eval_step,
    make_eval_step,
    make_train_step,
    predict_step,
    train_step,
)
