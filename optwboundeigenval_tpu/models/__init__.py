from optwboundeigenval_tpu.models.cnn_usps import CNNUSPS  # noqa: F401
from optwboundeigenval_tpu.models.mlp_forest import ForestNet  # noqa: F401
from optwboundeigenval_tpu.models.logistic import LogisticRegression  # noqa: F401
from optwboundeigenval_tpu.models.densenet import DenseNet3  # noqa: F401
