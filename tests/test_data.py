"""Data-module tests: split semantics, loaders, augmentation recipes,
padding/weights."""

import numpy as np
import pytest

from optwboundeigenval_tpu.data import cifar, forest, usps
from optwboundeigenval_tpu.data.loaders import ArrayLoader, train_valid_split
from optwboundeigenval_tpu.data.transforms import cifar_augment, usps_augment


def test_train_valid_split_deterministic_and_disjoint():
    tr1, va1 = train_valid_split(100, 1.0 / 7, seed=1226)
    tr2, va2 = train_valid_split(100, 1.0 / 7, seed=1226)
    np.testing.assert_array_equal(tr1, tr2)
    assert len(va1) == 14  # floor(100/7)
    assert set(tr1) | set(va1) == set(range(100))
    assert not (set(tr1) & set(va1))


def test_array_loader_pads_last_batch():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = np.arange(10, dtype=np.int32)
    loader = ArrayLoader(x, y, batch_size=4)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b["x"].shape == (4, 1) for b in batches)
    assert batches[-1]["w"].tolist() == [1, 1, 0, 0]
    # weighted count equals the real dataset size
    assert sum(float(b["w"].sum()) for b in batches) == 10


def test_array_loader_shuffle_reproducible():
    x = np.arange(20, dtype=np.float32).reshape(20, 1)
    y = np.arange(20, dtype=np.int32)
    a = list(ArrayLoader(x, y, 8, shuffle=True, seed=5))
    b = list(ArrayLoader(x, y, 8, shuffle=True, seed=5))
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["x"], bb["x"])


def test_usps_loaders_synthetic_fallback():
    train, valid = usps.get_train_valid_loader(batch_size=64)
    assert train.num_examples + valid.num_examples == usps.N_TRAIN
    assert valid.num_examples == int(np.floor(usps.N_TRAIN / 7))
    test = usps.get_test_loader(batch_size=64)
    assert test.num_examples == usps.N_TEST
    b = next(iter(train))
    assert b["x"].shape == (64, 16, 16, 1)
    na = usps.get_train_loader_na(batch_size=64)
    assert na.num_examples == train.num_examples
    assert na.augment is None and train.augment is None
    mnist = usps.get_mnist_loader(batch_size=32)
    assert next(iter(mnist))["x"].shape == (32, 16, 16, 1)
    gan = usps.get_gan_loader(batch_size=32)
    assert next(iter(gan))["x"].shape[0] == 32


def test_usps_libsvm_reader(tmp_path):
    import bz2

    lines = []
    rng = np.random.default_rng(0)
    for i in range(5):
        vals = rng.uniform(-1, 1, 256)
        toks = " ".join(f"{j+1}:{vals[j]:.4f}" for j in range(256))
        lines.append(f"{(i % 10) + 1}.0 {toks}\n")
    with bz2.open(tmp_path / "usps.bz2", "wt") as fh:
        fh.writelines(lines)
    x, y = usps.load_usps(str(tmp_path), train=True)
    assert x.shape == (5, 16, 16, 1)
    assert y.tolist() == [0, 1, 2, 3, 4]
    assert 0 <= x.min() and x.max() <= 1  # [-1,1] -> [0,1]


def test_forest_split_semantics():
    data = forest.get_data()
    n = (len(data["inputs"]) + len(data["inputs_valid"])
         + len(data["inputs_test"]))
    # 1/5 test then 1/5 valid of the remainder
    assert abs(len(data["inputs_test"]) / n - 0.2) < 0.01
    assert abs(len(data["inputs_valid"]) / (n * 0.8) - 0.2) < 0.01
    # scaler fit on train: mean ~0, std ~1
    assert np.abs(data["inputs"].mean(axis=0)).max() < 0.05
    assert np.abs(data["inputs"].std(axis=0) - 1).max() < 0.05


def test_cifar_loaders_and_norm():
    train, valid, train_na = cifar.get_train_valid_loader(
        batch_size=16, augment=False
    )
    b = next(iter(train))
    assert b["x"].shape == (16, 32, 32, 3)
    assert train_na.augment is None
    mean, std = cifar.get_norm()
    assert mean.shape == (3,) and std.shape == (3,)
    test = cifar.get_test_loader(batch_size=16, name="cifar100")
    assert next(iter(test))["y"].max() <= 99


def test_host_shard_partitions_data():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = np.arange(10, dtype=np.int32)
    shards = [ArrayLoader(x, y, 4, host_shard=(i, 2)) for i in range(2)]
    assert shards[0].num_examples + shards[1].num_examples == 10
    all_y = np.sort(np.concatenate([s.y for s in shards]))
    np.testing.assert_array_equal(all_y, y)


def test_augment_recipes_shapes():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 16, 16, 1)).astype(np.float32)
    out = usps_augment(pad=2, degrees=30)(x, rng)
    assert out.shape == x.shape
    xc = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    out2 = cifar_augment()(xc, rng)
    assert out2.shape == xc.shape
    # augmentation actually changes pixels
    assert np.abs(out2 - xc).max() > 0


def test_device_loader_matches_arrayloader():
    """DeviceArrayLoader (device-resident dataset, 512 B of index
    traffic per batch instead of the full pixel payload) yields
    bit-identical batches to ArrayLoader: same seeded shuffle order,
    same zero-filled w=0 padding rows."""
    from optwboundeigenval_tpu.data.device import DeviceArrayLoader

    rng = np.random.default_rng(3)
    x = rng.normal(size=(37, 4, 4, 2)).astype(np.float32)
    y = rng.integers(0, 5, size=37).astype(np.int32)
    host = ArrayLoader(x, y, batch_size=8, shuffle=True, seed=11)
    dev = DeviceArrayLoader(x, y, batch_size=8, shuffle=True, seed=11)
    for _ in range(2):  # shuffle state advances identically per epoch
        hb = list(host)
        db = list(dev)
        assert len(hb) == len(db) == 5
        for h, d in zip(hb, db):
            np.testing.assert_array_equal(h["x"], np.asarray(d["x"]))
            np.testing.assert_array_equal(h["y"], np.asarray(d["y"]))
            np.testing.assert_array_equal(h["w"], np.asarray(d["w"]))


def test_device_loader_random_batch_and_len():
    from optwboundeigenval_tpu.data.device import DeviceArrayLoader

    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    y = np.arange(10, dtype=np.int32)
    dev = DeviceArrayLoader(x, y, batch_size=4)
    assert len(dev) == 3
    assert dev.num_examples == 10
    b = dev.random_batch(np.random.default_rng(0))
    assert np.asarray(b["x"]).shape == (4, 2)
    assert b["w"].sum() == 4.0


def test_device_loader_transform_and_augment():
    """On-device transform (uint8 storage -> normalized float: the
    dataset sits in HBM at 1/4 footprint) and key-driven augmentation
    (random flip+crop on device, cifar_data.py:98-106 recipe) —
    deterministic from the seed, padding rows stay zero."""
    import jax.numpy as jnp

    from optwboundeigenval_tpu.data.device import (
        DeviceArrayLoader, cifar_augment_device)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(21, 8, 8, 3)).astype(np.uint8)
    y = rng.integers(0, 5, size=21).astype(np.int32)

    def mk():
        return DeviceArrayLoader(
            x, y, batch_size=8, shuffle=True, seed=5,
            transform=lambda xb: xb.astype(jnp.float32) / 255.0,
            augment=cifar_augment_device,
        )

    b1 = list(mk())
    b2 = list(mk())
    assert len(b1) == 3
    for a, b in zip(b1, b2):  # same seed -> identical augmented stream
        np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
        np.testing.assert_array_equal(np.asarray(a["y"]), np.asarray(b["y"]))
    xa = np.asarray(b1[0]["x"])
    assert xa.dtype == np.float32 and xa.max() <= 1.0
    # padded tail rows (w=0) are zero even after transform+augment
    last = b1[-1]
    np.testing.assert_array_equal(
        np.asarray(last["x"])[last["w"] == 0], 0.0)
    # random_batch applies transform but never augmentation
    rb1 = mk().random_batch(np.random.default_rng(1))
    rb2 = mk().random_batch(np.random.default_rng(1))
    np.testing.assert_array_equal(np.asarray(rb1["x"]), np.asarray(rb2["x"]))


def test_cifar_augment_device_is_flip_crop():
    """Every augmented image must be an (optionally flipped) crop of the
    zero-padded original."""
    import jax

    from optwboundeigenval_tpu.data.device import cifar_augment_device

    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 6, 6, 1)).astype(np.float32)
    out = np.asarray(cifar_augment_device(
        jnp.asarray(x) if False else x, jax.random.PRNGKey(0), pad=2))
    assert out.shape == x.shape
    for i in range(4):
        cands = []
        for img in (x[i], x[i][:, ::-1, :]):
            p = np.pad(img, ((2, 2), (2, 2), (0, 0)))
            for oy in range(5):
                for ox in range(5):
                    cands.append(p[oy:oy + 6, ox:ox + 6, :])
        assert any(np.allclose(out[i], c) for c in cands)
