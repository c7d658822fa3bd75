"""Chest x-ray datasets: NIH ChestXray-8/14, CheXpert, MIMIC-CXR.

Reference surface (dcnn.py:23-200): CSV-driven datasets with per-class
dicts, NaN labels for uncertain (-1) CheXpert/MIMIC findings, NIH
official test split + 87.5/12.5 train/val with pandas
``random_state=0`` (dcnn.py:46-47), dict samples, torchvision-style
resize/TenCrop transforms.

The reference hardcodes private roots (dcnn.py:25, :94, :150 — called
out in SURVEY.md §7); here roots are configurable and a deterministic
synthetic stand-in with the same label spaces serves the zero-egress
environment.  Images are decoded lazily per batch (the 100k-image
datasets never fit in RAM), yielding the same padded/weighted batch
dicts as ArrayLoader.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.data.synthetic import make_multilabel

NIH_CLASSES: Dict[str, int] = {
    "Atelectasis": 0, "Cardiomegaly": 1, "Effusion": 2, "Infiltration": 3,
    "Mass": 4, "Nodule": 5, "Pneumonia": 6, "Pneumothorax": 7,
    "Consolidation": 8, "Edema": 9, "Emphysema": 10, "Fibrosis": 11,
    "Pleural_Thickening": 12, "Hernia": 13,
}
CHEXPERT_CLASSES: Dict[str, int] = {
    "Enlarged Cardiomediastinum": 0, "Cardiomegaly": 1, "Lung Opacity": 2,
    "Lung Lesion": 3, "Edema": 4, "Consolidation": 5, "Pneumonia": 6,
    "Atelectasis": 7, "Pneumothorax": 8, "Pleural Effusion": 9,
    "Pleural Other": 10, "Fracture": 11, "Support Devices": 12,
}
MIMIC_CLASSES: Dict[str, int] = {
    "Enlarged Cardiomediastinum": 0, "Cardiomegaly": 1, "Airspace Opacity": 2,
    "Lung Lesion": 3, "Edema": 4, "Consolidation": 5, "Pneumonia": 6,
    "Atelectasis": 7, "Pneumothorax": 8, "Pleural Effusion": 9,
    "Pleural Other": 10, "Fracture": 11, "Support Devices": 12,
}

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def ten_crop(x: np.ndarray, crop: int) -> np.ndarray:
    """torchvision TenCrop: 4 corners + center, plus horizontal flips.
    x: (H, W, C) -> (10, crop, crop, C)."""
    h, w, _ = x.shape
    tl = x[:crop, :crop]
    tr_ = x[:crop, -crop:]
    bl = x[-crop:, :crop]
    br = x[-crop:, -crop:]
    i, j = (h - crop) // 2, (w - crop) // 2
    cc = x[i : i + crop, j : j + crop]
    crops = np.stack([tl, tr_, bl, br, cc])
    return np.concatenate([crops, crops[:, :, ::-1, :]], axis=0)


class CXRImageLoader:
    """Lazy image-decoding loader producing the framework batch dict.
    ``records`` is a list of (image_path, label_vector)."""

    def __init__(
        self,
        records: List,
        class_to_idx: Dict[str, int],
        batch_size: int = 16,
        *,
        size: int = 224,
        crops: bool = False,
        shuffle: bool = False,
        seed: int = 0,
        name: str = "",
    ):
        self.records = records
        self.class_to_idx = class_to_idx
        self.batch_size = batch_size
        self.size = size
        self.crops = crops
        self.shuffle = shuffle
        self.name = name
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return (len(self.records) + self.batch_size - 1) // self.batch_size

    @property
    def num_examples(self):
        return len(self.records)

    def _decode(self, path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        if self.crops:
            img = img.resize((256, 256))
            x = np.asarray(img, np.float32) / 255.0
            x = ten_crop(x, self.size)  # (10, s, s, 3)
            return (x - IMAGENET_MEAN) / IMAGENET_STD
        img = img.resize((self.size, self.size))
        x = np.asarray(img, np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def __iter__(self):
        order = np.arange(len(self.records))
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            take = order[start : start + bs]
            xs = np.stack([self._decode(self.records[i][0]) for i in take])
            ys = np.stack([self.records[i][1] for i in take])
            w = np.ones(len(take), np.float32)
            if len(take) < bs:
                padn = bs - len(take)
                xs = np.concatenate(
                    [xs, np.zeros((padn,) + xs.shape[1:], xs.dtype)]
                )
                ys = np.concatenate(
                    [ys, np.zeros((padn,) + ys.shape[1:], ys.dtype)]
                )
                w = np.concatenate([w, np.zeros(padn, np.float32)])
            yield {"x": xs, "y": ys, "w": w}

    def random_batch(self, rng=None):
        return next(iter(self))


def _synthetic_loader(classes, n, batch_size, seed, nan_frac=0.0, size=64,
                      name=""):
    x, y = make_multilabel(
        n, shape=(size, size, 3), n_classes=len(classes), seed=seed,
        nan_frac=nan_frac,
    )
    loader = ArrayLoader(x, y, batch_size, shuffle=True, seed=seed)
    loader.class_to_idx = classes
    loader.name = name
    return loader


def _nih_records(root: str, use: str):
    import pandas as pd

    label_df = pd.read_csv(os.path.join(root, "Data_Entry_2017.csv"))
    te = pd.read_csv(os.path.join(root, "test_list.txt"), header=None)[0]
    tr_val = pd.read_csv(
        os.path.join(root, "train_val_list.txt"), header=None
    )[0]
    # 87.5/12.5 with pandas random_state=0 (dcnn.py:46-47)
    shuffled = tr_val.sample(frac=1, random_state=0)
    cut = int(len(tr_val) * 0.875)
    tr, val = shuffled.iloc[:cut], shuffled.iloc[cut:]
    sel = {"train": tr, "validation": val, "test": te}[use]
    df = label_df.loc[label_df["Image Index"].isin(sel)]
    img_dir = os.path.join(root, "images")
    records = []
    for _, row in df.iterrows():
        labels = np.zeros(len(NIH_CLASSES), np.float32)
        for finding in str(row.iloc[1]).split("|"):
            finding = finding.strip()
            if finding in NIH_CLASSES:
                labels[NIH_CLASSES[finding]] = 1
        records.append((os.path.join(img_dir, row.iloc[0]), labels))
    return records


def get_nih_loader(
    use: str = "train",
    batch_size: int = 16,
    root: Optional[str] = None,
    size: int = 224,
    crops: bool = False,
    synthetic_n: int = 256,
):
    """NIH ChestXray loader (ChestXray_Dataset, dcnn.py:23-89)."""
    if root is not None and os.path.exists(
        os.path.join(root, "Data_Entry_2017.csv")
    ):
        records = _nih_records(root, use)
        return CXRImageLoader(
            records, NIH_CLASSES, batch_size, size=size, crops=crops,
            shuffle=(use == "train"), name="NIH",
        )
    seed = {"train": 11, "validation": 12, "test": 13}.get(use, 14)
    return _synthetic_loader(NIH_CLASSES, synthetic_n, batch_size, seed,
                             name="NIH")


def _csv_records(root: str, csv_name: str, classes, img_root: str):
    import pandas as pd

    df = pd.read_csv(os.path.join(root, csv_name))
    records = []
    for _, row in df.iterrows():
        labels = np.zeros(len(classes), np.float32)
        for cls, idx in classes.items():
            if cls in df.columns:
                v = row[cls]
                if v == 1:
                    labels[idx] = 1
                elif v == -1:
                    labels[idx] = np.nan  # uncertain -> NaN (dcnn.py:134-135)
        records.append((os.path.join(img_root, str(row.iloc[0])), labels))
    return records


def get_chexpert_loader(
    use: str = "train",
    batch_size: int = 16,
    root: Optional[str] = None,
    size: int = 224,
    crops: bool = False,
    synthetic_n: int = 256,
):
    """CheXpert loader (CheXpert_Dataset, dcnn.py:92-145)."""
    if root is not None and os.path.exists(os.path.join(root, "train.csv")):
        csv = {"train": "train.csv", "validation": "valid.csv"}[use]
        records = _csv_records(root, csv, CHEXPERT_CLASSES,
                               os.path.dirname(root))
        return CXRImageLoader(
            records, CHEXPERT_CLASSES, batch_size, size=size, crops=crops,
            shuffle=(use == "train"), name="CheXpert",
        )
    seed = {"train": 21, "validation": 22}.get(use, 23)
    return _synthetic_loader(CHEXPERT_CLASSES, synthetic_n, batch_size, seed,
                             nan_frac=0.1, name="CheXpert")


def get_mimic_loader(
    use: str = "train",
    batch_size: int = 16,
    root: Optional[str] = None,
    size: int = 224,
    crops: bool = False,
    synthetic_n: int = 256,
):
    """MIMIC-CXR loader (MIMICCXR_Dataset, dcnn.py:148-200)."""
    if root is not None and os.path.exists(os.path.join(root, "train.csv")):
        csv = {"train": "train.csv", "validation": "valid.csv"}[use]
        records = _csv_records(root, csv, MIMIC_CLASSES, root)
        return CXRImageLoader(
            records, MIMIC_CLASSES, batch_size, size=size, crops=crops,
            shuffle=(use == "train"), name="MIMIC",
        )
    seed = {"train": 31, "validation": 32}.get(use, 33)
    return _synthetic_loader(MIMIC_CLASSES, synthetic_n, batch_size, seed,
                             nan_frac=0.1, name="MIMIC")
