from optwboundeigenval_tpu.analysis.comp import comp_test  # noqa: F401
