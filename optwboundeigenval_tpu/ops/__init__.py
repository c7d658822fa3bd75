from optwboundeigenval_tpu.ops import curvature, eigen, spectral  # noqa: F401
