"""Chest x-ray VGG16-bn unregularized (reference params/chestxray_mu0_vgg.py)."""

from optwboundeigenval_tpu.configs._cxr_family import chestxray_config


def options():
    return chestxray_config(mu=0.0, K=0.0, enc="vgg16_bn")
