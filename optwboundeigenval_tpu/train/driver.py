"""Config driver — the reference ``main(pfile)`` entry point
(opt.py:1984-2102) rebuilt for the TPU trainer.

A config module exports ``options() -> dict`` holding live objects
(Task/model, optimizer, loaders) exactly like the reference params
files (SURVEY.md §2.10).  ``run(options)`` filters the dict into the
trainer constructor by reflection (the reference's
``missing_params``/``arg_dic``, opt.py:1940-1965) and executes the
train -> test -> parse -> aug_test -> comp_test -> rho_test ->
saliency/jaccard cascade off the option flags (opt.py:2018-2102).
"""

from __future__ import annotations

import importlib
import inspect
from typing import Any, Dict

import numpy as np

from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.train.task import Task, losses
from optwboundeigenval_tpu.train.trainer import SpectralTrainer


def arg_dic(fn, options: Dict[str, Any], replace=None) -> Dict[str, Any]:
    """Filter ``options`` down to the kwargs ``fn`` accepts
    (opt.py:1963-1965); ``replace`` maps option names to arg names
    (opt.py:2009)."""
    sig = inspect.signature(fn)
    names = set(sig.parameters)
    out = {k: v for k, v in options.items() if k in names}
    for src, dst in (replace or {}).items():
        if src in options and dst in names:
            out[dst] = options[src]
    return out


def build_trainer(options: Dict[str, Any]) -> SpectralTrainer:
    task = options.get("task")
    if task is None:
        loss = options.get("loss", "cross_entropy")
        if isinstance(loss, str):
            loss = losses[loss]
        task = Task(
            model=options["model"],
            loss=loss,
            has_batch_stats=options.get("has_batch_stats", False),
            has_dropout=options.get("has_dropout", False),
        )
    optimizer = options["optimizer"]
    kwargs = arg_dic(SpectralTrainer.__init__, options, replace={"tol": "eps"})
    kwargs.pop("task", None)
    kwargs.pop("optimizer", None)
    kwargs.pop("scheduler", None)
    av = options.get("asymmetric_valley", False)
    if av:
        from optwboundeigenval_tpu.train.asymmetric_valley import (
            AsymmetricValleyTrainer,
        )

        kwargs2 = arg_dic(AsymmetricValleyTrainer.__init__, options)
        kwargs2.update(kwargs)
        kwargs2.pop("task", None)
        kwargs2.pop("optimizer", None)
        kwargs2.pop("scheduler", None)
        return AsymmetricValleyTrainer(
            task, optimizer, options.get("scheduler"), **kwargs2
        )
    return SpectralTrainer(task, optimizer, options.get("scheduler"), **kwargs)


def _loaders(options, batch_size):
    """Wrap raw arrays into loaders (assert_dl, opt.py:1969-1973)."""

    def get(key_loader, key_x, key_y):
        if options.get(key_loader) is not None:
            return options[key_loader]
        if options.get(key_x) is not None:
            return ArrayLoader(
                np.asarray(options[key_x]),
                np.asarray(options[key_y]),
                batch_size,
            )
        return None

    train_loader = get("train_loader", "inputs", "target")
    valid_loader = get("valid_loader", "inputs_valid", "target_valid")
    test_loaders = options.get("test_loader")
    if test_loaders is None and options.get("inputs_test") is not None:
        test_loaders = ArrayLoader(
            np.asarray(options["inputs_test"]),
            np.asarray(options["target_test"]),
            batch_size,
        )
    if test_loaders is not None and not isinstance(test_loaders, list):
        test_loaders = [test_loaders]
    return train_loader, valid_loader, test_loaders


def run(options: Dict[str, Any]) -> SpectralTrainer:
    """Execute the full cascade (opt.py:2012-2102)."""
    trainer = build_trainer(options)
    batch_size = options.get("batch_size", 128)
    train_loader, valid_loader, test_loaders = _loaders(options, batch_size)
    if options.get("device_data") and isinstance(
            getattr(train_loader, "loader", train_loader), ArrayLoader):
        # a PrefetchLoader wrapper is dropped: prefetch threads exist to
        # hide host batch assembly, which device residency eliminates
        train_loader = getattr(train_loader, "loader", train_loader)
        # device-resident training data (HBM dataset + on-device
        # gather): removes the per-batch host->device pixel transfers —
        # the dominant epoch cost on a tunneled chip (RESULTS.md epoch
        # table).  Config may supply a device-side augment via
        # device_augment= (host augment hooks cannot be converted).
        from optwboundeigenval_tpu.data.device import as_device_loader

        train_loader = as_device_loader(
            train_loader,
            transform=options.get("device_transform"),
            augment=options.get("device_augment"),
        )
    train_loader_na = options.get("train_loader_na")
    crops = options.get("crops", False)

    # pretrained trunk overlay (the reference downloads torchvision
    # weights at model construction, dcnn.py:269-278 / dnet.py:328-343;
    # here: an offline npz produced by scripts/convert_torch_weights.py)
    pretrained = options.get("pretrained_npz")
    if pretrained:
        from optwboundeigenval_tpu.models.backbones import load_pretrained_npz

        loader0 = train_loader or (test_loaders[0] if test_loaders else None)
        if loader0 is None:
            raise ValueError(
                "pretrained_npz requires a train or test loader to "
                "provide an example batch for parameter initialization"
            )
        trainer.init_state(next(iter(loader0)))
        overlaid = load_pretrained_npz(
            {"params": trainer.params, **dict(trainer.model_state)},
            pretrained,
            prefix=options.get("pretrained_prefix", "features"),
        )
        trainer.params = overlaid.pop("params")
        trainer.model_state = type(trainer.model_state)(overlaid) \
            if overlaid else trainer.model_state

    if options.get("train", True):
        trainer.train(
            train_loader=train_loader,
            valid_loader=valid_loader,
            train_loader_na=train_loader_na,
            crops=crops,
        )
    else:
        if train_loader is not None:
            trainer.init_state(next(iter(train_loader)))
        trainer.model_load(options.get("fname"))

    if options.get("test", True) and test_loaders:
        for tl in test_loaders:
            trainer.test_set(
                loader=tl,
                label="Test",
                crops=crops,
                **arg_dic(
                    trainer.test_model,
                    {
                        k: options[k]
                        for k in ("classes", "model_classes", "other_classes")
                        if k in options
                    },
                ),
            )

    trainer.parse()

    if options.get("aug_test", False) and options.get("test_loader_aug") is not None:
        tla = options["test_loader_aug"]
        for tl in tla if isinstance(tla, list) else [tla]:
            trainer.test_set(loader=tl, label="Aug Test", crops=crops)

    if options.get("comp_test", False) and test_loaders:
        from optwboundeigenval_tpu.analysis import comp_test as _comp_test

        _comp_test(trainer, test_loaders, options)

    if options.get("rho_test", False):
        loader = (
            train_loader_na if train_loader_na is not None else train_loader
        )
        trainer.rho_test(loader=loader)

    if options.get("saliency", False) and test_loaders:
        from optwboundeigenval_tpu.analysis.saliency import saliency_maps

        for tl in test_loaders:
            saliency_maps(trainer, tl, max_img=options.get("max_img", 10))

    if options.get("jaccard", False) and test_loaders:
        # model-vs-baseline saliency audit (opt.py:1364-1714); the
        # baseline is a comparator checkpoint named by comp_fname
        from optwboundeigenval_tpu.analysis.jaccard import jaccard_audit

        baseline = options.get("baseline_trainer")
        if baseline is None and options.get("comp_fname"):
            baseline = build_trainer(options)
            baseline.init_state(next(iter(test_loaders[0])))
            fname = options["comp_fname"]
            baseline.model_load(fname[0] if isinstance(fname, list) else fname)
        if baseline is not None:
            jaccard_audit(
                trainer, baseline, test_loaders[0],
                max_img=options.get("max_img", 25),
                method=options.get("saliency_method", "saliency"),
                layer_path=options.get("cam_layer"),
            )

    if options.get("jaccard_comp", False) and test_loaders:
        from optwboundeigenval_tpu.analysis.jaccard import jaccard_comp

        others = options.get("comp_trainers", [])
        if others:
            jaccard_comp(
                [trainer] + list(others), test_loaders[0],
                method=options.get("saliency_method", "saliency"),
                layer_path=options.get("cam_layer"),
            )

    return trainer


def main(config_name: str) -> SpectralTrainer:
    """CLI entry: ``python main.py <config module>`` — mirrors
    main.py:16-19 + opt.py:1984."""
    mod = importlib.import_module(config_name)
    return run(mod.options())
