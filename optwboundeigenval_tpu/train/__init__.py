from optwboundeigenval_tpu.train.task import Task, losses  # noqa: F401
from optwboundeigenval_tpu.train.trainer import SpectralTrainer  # noqa: F401
