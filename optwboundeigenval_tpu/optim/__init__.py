from optwboundeigenval_tpu.optim.api import (  # noqa: F401
    Optimizer,
    adam,
    sgd,
    from_optax,
)
from optwboundeigenval_tpu.optim import schedules  # noqa: F401
from optwboundeigenval_tpu.optim.sam import SAM  # noqa: F401
from optwboundeigenval_tpu.optim.entropy_sgd import EntropySGD  # noqa: F401
from optwboundeigenval_tpu.optim.kfac_optimizer import KFAC  # noqa: F401
