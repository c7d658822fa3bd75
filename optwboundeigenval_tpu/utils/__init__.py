from optwboundeigenval_tpu.utils import tree  # noqa: F401
