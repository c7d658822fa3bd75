"""Forest CoverType (UCI covtype) — tabular 54-feature, 7-class.

Reference surface (forest_data.py:30-71): download covtype.data.gz,
1/5 test + 1/5 valid splits with random_state 1226, StandardScaler fit
on train, returns plain arrays keyed ``inputs/target/..._valid/_test``.

Zero-egress: reads ``covtype.data`` / ``covtype.csv`` from ``root`` if
present, else a synthetic 54-feature stand-in.  Split semantics use
sklearn ``train_test_split(random_state=1226)`` exactly as the
reference so real-data runs reproduce the reference partitions.
"""

from __future__ import annotations

import os

import numpy as np

from optwboundeigenval_tpu.data.synthetic import make_classification

SEED = 1226


def load_covtype(root: str = "./data"):
    for name in ("covtype.csv", "covtype.data"):
        path = os.path.join(root, name)
        if os.path.exists(path):
            import pandas as pd

            data = pd.read_csv(path, header=None)
            X = data.values[:, :-1].astype(np.float64)
            y = (data.values[:, -1] - 1).astype(np.int64)  # 1..7 -> 0..6
            return X, y
    x, y = make_classification(20000, 54, 7, seed=SEED, noise=2.5)
    return x.astype(np.float64), y.astype(np.int64)


def get_data(root: str = "./data"):
    """Split + scale exactly as forest_data.py:48-60."""
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    X, y = load_covtype(root)
    X, X_test, y, y_test = train_test_split(
        X, y, test_size=1 / 5, random_state=SEED
    )
    X, X_valid, y, y_valid = train_test_split(
        X, y, test_size=1 / 5, random_state=SEED
    )
    scaler = StandardScaler().fit(X)
    return {
        "inputs": scaler.transform(X).astype(np.float32),
        "target": y.astype(np.int32),
        "inputs_valid": scaler.transform(X_valid).astype(np.float32),
        "target_valid": y_valid.astype(np.int32),
        "inputs_test": scaler.transform(X_test).astype(np.float32),
        "target_test": y_test.astype(np.int32),
        # raw (pre-scaling) train stats used by covariate-shift analysis
        "scaler_mean": scaler.mean_.astype(np.float32),
        "scaler_scale": scaler.scale_.astype(np.float32),
    }
