from optwboundeigenval_tpu.ops import curvature, eigen, spectral  # noqa: F401
from optwboundeigenval_tpu.ops import kfac, pallas_kernels  # noqa: F401
