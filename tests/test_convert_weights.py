"""torch->npz pretrained-converter tests: a RANDOM torch densenet121
(the reference's own dnet.py fork, executed as-is) is converted and
overlaid onto the flax DenseNetFeatures; feature maps must agree.

Closes the round-1 'pretrained trunks unusable in practice' gap
(dnet.py:328-343 URL loading becomes offline conversion)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def torch_densenet():
    from benchmarks.parity import _refenv

    _refenv.install()
    torch = pytest.importorskip("torch")
    import dnet

    torch.manual_seed(0)
    return torch, dnet.densenet121(pretrained=False)


def test_densenet121_feature_agreement(torch_densenet, tmp_path):
    torch, model = torch_densenet
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F

    from optwboundeigenval_tpu.models.backbones import (
        densenet121_features,
        load_pretrained_npz,
    )
    from scripts.convert_torch_weights import convert_densenet_features

    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    out = convert_densenet_features(sd, "densenet121")
    npz = tmp_path / "dn121.npz"
    np.savez(npz, **out)

    feat = densenet121_features()
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    variables = feat.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = load_pretrained_npz(dict(variables), str(npz))
    y_flax = feat.apply(variables, jnp.asarray(x), train=False)

    model.eval()
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # dcnn wrappers take model.features then relu (dcnn.py:269-278);
        # DenseNetFeatures applies the final relu internally
        y_torch = F.relu(model.features(t)).numpy().transpose(0, 2, 3, 1)

    assert y_flax.shape == y_torch.shape
    np.testing.assert_allclose(
        np.asarray(y_flax), y_torch, rtol=1e-4, atol=1e-4
    )


def test_loader_tolerates_missing_and_mismatched(torch_densenet, tmp_path):
    """load_pretrained_npz keeps the random init for absent/mismatched
    keys — the reference's tolerant loading (opt.py:1041-1059)."""
    import jax
    import jax.numpy as jnp

    from optwboundeigenval_tpu.models.backbones import (
        densenet121_features,
        load_pretrained_npz,
    )

    feat = densenet121_features()
    x = jnp.zeros((1, 32, 32, 3))
    variables = dict(feat.init(jax.random.PRNGKey(0), x, train=False))
    # npz with one valid key, one shape-mismatched, one unknown
    k0 = np.asarray(variables["params"]["Conv_0"]["kernel"])
    np.savez(
        tmp_path / "part.npz",
        **{
            "params/Conv_0/kernel": np.ones_like(k0),
            "params/Conv_1/kernel": np.zeros((1, 1, 1, 1), np.float32),
            "params/NoSuch/kernel": np.zeros((3,), np.float32),
        },
    )
    before = np.asarray(variables["params"]["Conv_1"]["kernel"]).copy()
    out = load_pretrained_npz(variables, str(tmp_path / "part.npz"))
    np.testing.assert_array_equal(
        np.asarray(out["params"]["Conv_0"]["kernel"]), np.ones_like(k0)
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["Conv_1"]["kernel"]), before
    )


def test_cxr_prefix_overlay(tmp_path):
    """The CXR wrapper nests the trunk under 'features'; the prefix-
    tolerant loader must land npz keys there (driver option
    pretrained_npz/pretrained_prefix)."""
    import jax
    import jax.numpy as jnp

    from optwboundeigenval_tpu.models.backbones import load_pretrained_npz
    from optwboundeigenval_tpu.models.cxr import CXRModel

    model = CXRModel(backbone="densenet121", outnum=14)
    x = jnp.zeros((1, 64, 64, 3))
    variables = dict(model.init(jax.random.PRNGKey(0), x, train=False))
    k0 = np.asarray(variables["params"]["features"]["Conv_0"]["kernel"])
    bn_mean = np.asarray(
        variables["batch_stats"]["features"]["BatchNorm_0"]["mean"]
    )
    np.savez(
        tmp_path / "trunk.npz",
        **{
            "params/Conv_0/kernel": np.ones_like(k0),
            "batch_stats/BatchNorm_0/mean": np.ones_like(bn_mean),
        },
    )
    out = load_pretrained_npz(variables, str(tmp_path / "trunk.npz"),
                              prefix="features")
    np.testing.assert_array_equal(
        np.asarray(out["params"]["features"]["Conv_0"]["kernel"]),
        np.ones_like(k0),
    )
    np.testing.assert_array_equal(
        np.asarray(out["batch_stats"]["features"]["BatchNorm_0"]["mean"]),
        np.ones_like(bn_mean),
    )


def test_load_torch_checkpoint_usps(torch_densenet, tmp_path):
    """Reference-checkpoint interop (opt.py:765-769, 1041-1059): a .pt
    saved the reference way (nested state_dict, module. prefixes) loads
    into CNNUSPS with forward agreement."""
    torch, _ = torch_densenet
    import jax
    import jax.numpy as jnp

    from optwboundeigenval_tpu.models import CNNUSPS
    from optwboundeigenval_tpu.train import checkpoints

    from usps_data import CNN  # reference model, executed as-is

    torch.manual_seed(3)
    m = CNN()
    # save with the reference's tolerated decorations
    sd = {"module." + k: v for k, v in m.state_dict().items()}
    pt = tmp_path / "ckpt.pt"
    torch.save({"state_dict": sd, "epoch": 7}, pt)

    params = checkpoints.load_torch_checkpoint(str(pt), "usps_cnn")
    x = np.random.default_rng(0).normal(size=(4, 256)).astype(np.float32)
    model = CNNUSPS()
    logits = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                         jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(x)).numpy()  # softmax in-model
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(logits, axis=-1)), ref_out,
        rtol=1e-4, atol=1e-5,
    )


def test_resnet50_feature_agreement(torch_densenet, tmp_path):
    """The resnet50 converter must scope names per nested
    _Bottleneck_{k} submodule (unlike the inline-compact backbones) —
    a random torchvision resnet50 converted + overlaid must reproduce
    the torch feature maps."""
    torch, _ = torch_densenet
    import jax
    import jax.numpy as jnp
    import torch.nn as nn
    import torch.nn.functional as F

    from optwboundeigenval_tpu.models.backbones import (
        ResNet50Features,
        load_pretrained_npz,
    )
    from scripts.convert_torch_weights import convert_resnet50_features

    # torchvision is not installed in this image (stubbed by _refenv),
    # so replicate torchvision.models.resnet50's architecture AND
    # state_dict naming (layer{s}.{b}.conv1/bn1/.../downsample.{0,1})
    class TorchBottleneck(nn.Module):
        def __init__(self, cin, f, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, f, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(f)
            self.conv2 = nn.Conv2d(f, f, 3, stride=stride, padding=1,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(f)
            self.conv3 = nn.Conv2d(f, f * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(f * 4)
            self.downsample = None
            if stride != 1 or cin != f * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, f * 4, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(f * 4),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return F.relu(idt + y)

    class TorchResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            cin = 64
            for s, (n, f) in enumerate(
                zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1
            ):
                blocks = []
                for b in range(n):
                    stride = 2 if (s > 1 and b == 0) else 1
                    blocks.append(TorchBottleneck(cin, f, stride))
                    cin = f * 4
                setattr(self, f"layer{s}", nn.Sequential(*blocks))

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.max_pool2d(x, 3, 2, padding=1)
            for s in range(1, 5):
                x = getattr(self, f"layer{s}")(x)
            return x

    torch.manual_seed(1)
    model = TorchResNet50()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    out = convert_resnet50_features(sd)
    npz = tmp_path / "rn50.npz"
    np.savez(npz, **out)

    feat = ResNet50Features()
    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    variables = dict(feat.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               train=False))
    # every parameter in the tree must be covered by the npz (no
    # silently-kept random init — the bug this test pins)
    names = set(np.load(npz).files)
    leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    for path, _ in leaves:
        key = "params/" + "/".join(p.key for p in path)
        assert key in names, f"converter missed {key}"
    variables = load_pretrained_npz(variables, str(npz))
    y_flax = feat.apply(variables, jnp.asarray(x), train=False)

    model.eval()
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y_torch = model(t).numpy().transpose(0, 2, 3, 1)

    assert y_flax.shape == y_torch.shape
    np.testing.assert_allclose(
        np.asarray(y_flax), y_torch, rtol=1e-3, atol=1e-3
    )


def test_save_torch_checkpoint_roundtrip(torch_densenet, tmp_path):
    """Reverse interop: a flax-trained model exported via
    save_torch_checkpoint loads into the REFERENCE model with forward
    agreement (both directions of migration work)."""
    torch, _ = torch_densenet
    import jax
    import jax.numpy as jnp

    from forest_data import Net
    from usps_data import CNN

    from optwboundeigenval_tpu.models import CNNUSPS, ForestNet
    from optwboundeigenval_tpu.train import checkpoints

    # forest
    model = ForestNet()
    x = np.random.default_rng(0).normal(size=(4, 54)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    pt = tmp_path / "forest.pt"
    checkpoints.save_torch_checkpoint(params, str(pt), "forest")
    tnet = Net()
    tnet.load_state_dict(torch.load(pt, weights_only=True))
    tnet.eval()
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    ours = jax.nn.softmax(
        model.apply({"params": params}, jnp.asarray(x)), axis=-1)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-5,
                               atol=1e-6)

    # usps cnn (conv + flatten permutation path)
    model = CNNUSPS()
    x = np.random.default_rng(1).normal(size=(4, 256)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(4), jnp.asarray(x.reshape(-1, 16, 16, 1))
    )["params"]
    pt = tmp_path / "usps.pt"
    checkpoints.save_torch_checkpoint(params, str(pt), "usps_cnn")
    tcnn = CNN()
    tcnn.load_state_dict(torch.load(pt, weights_only=True))
    tcnn.eval()
    with torch.no_grad():
        ref_out = tcnn(torch.from_numpy(x)).numpy()
    logits = model.apply(
        {"params": params}, jnp.asarray(x.reshape(-1, 16, 16, 1)),
        train=False)
    ours = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4,
                               atol=1e-6)
