from optwboundeigenval_tpu.data.loaders import ArrayLoader  # noqa: F401
