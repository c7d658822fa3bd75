"""CIFAR-100 ResNet50-head recipe (reference params/cifar100_ResNet_mu0.py:
MyResNet50(100), Adam, unregularized)."""

from optwboundeigenval_tpu.configs._families import cifar10_config
from optwboundeigenval_tpu.data import cifar
from optwboundeigenval_tpu.models.cxr import CXRModel
from optwboundeigenval_tpu.optim import adam


def options():
    opt = cifar10_config(mu=0.0, K=0.0)
    (
        opt["train_loader"],
        opt["valid_loader"],
        opt["train_loader_na"],
    ) = cifar.get_train_valid_loader(batch_size=32, name="cifar100")
    opt["test_loader"] = [cifar.get_test_loader(batch_size=32, name="cifar100")]
    opt["model"] = CXRModel(backbone="resnet50", outnum=100)
    opt["optimizer"] = adam(1e-3)
    opt["scheduler"] = None
    opt["header"] = "CIFAR100_ResNet"
    return opt
