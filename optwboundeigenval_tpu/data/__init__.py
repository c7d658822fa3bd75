from optwboundeigenval_tpu.data.device import DeviceArrayLoader  # noqa: F401
from optwboundeigenval_tpu.data.loaders import ArrayLoader  # noqa: F401
