"""Cross-dataset comparison evaluation.

Reference ``comp_test`` (opt.py:1198-1242): when several test datasets
have different label spaces (NIH vs CheXpert vs MIMIC chest x-ray), it
intersects their class dictionaries, derives index remaps, and runs
``test_set`` per dataset restricted to the common classes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence


def intersect_classes(
    class_dicts: Sequence[Dict[str, int]],
) -> List[Dict[str, int]]:
    """Given per-dataset {class_name: index} dicts, return per-dataset
    remap dicts restricted to the common classes, ordered by the FIRST
    dataset's class order — the reference iterates classes[0] and keeps
    those present everywhere (opt.py:1200-1204), so the overlap list
    (and the printed log line) follow loader-0's ordering, not sorted
    order."""
    common = set(class_dicts[0])
    for d in class_dicts[1:]:
        common &= set(d)
    names = [x for x in class_dicts[0] if x in common]
    return [{name: d[name] for name in names} for d in class_dicts]


def comp_test(trainer, test_loaders, options) -> None:
    """Run the best model over each test loader with class remapping.

    Loaders may carry a ``class_to_idx`` attribute (chest x-ray
    datasets); when present across all loaders, evaluation is
    restricted to the intersection of class spaces, with the model's
    output columns remapped via ``model_classes``.  Without class
    dicts this reduces to a plain per-loader ``test_set``
    (the USPS/GAN comp_test usage)."""
    dicts = [getattr(tl, "class_to_idx", None) for tl in test_loaders]
    model_dict = options.get("model_class_to_idx")
    if all(d is not None for d in dicts) and model_dict is not None:
        remaps = intersect_classes([model_dict] + list(dicts))
        model_remap, data_remaps = remaps[0], remaps[1:]
        model_classes = list(model_remap.values())
        # the reference appends the overlap list to the log
        # (opt.py:1207-1212); standalone invocation may precede any
        # train() that would have created the directory
        os.makedirs(trainer.log_dir, exist_ok=True)
        with open(trainer.log_file, "a") as fh:
            fh.write(f"{list(model_remap.keys())}\n")
        for tl, remap in zip(test_loaders, data_remaps):
            trainer.test_set(
                loader=tl,
                classes=list(remap.values()),
                model_classes=model_classes,
                label=f"Comp Test {getattr(tl, 'name', '')}",
                crops=options.get("crops", False),
            )
    else:
        for i, tl in enumerate(test_loaders):
            trainer.test_set(
                loader=tl,
                label=f"Comp Test {i}",
                crops=options.get("crops", False),
            )
