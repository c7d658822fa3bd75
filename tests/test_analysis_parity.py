"""Analysis-layer head-to-head vs the reference implementation
(executed as-is, torch CPU): covariate-shift log-densities and the full
importance-weighted test_model_cov metric protocol."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_env():
    from benchmarks.parity import _refenv

    _refenv.install()
    torch = pytest.importorskip("torch")
    return torch


def test_get_prob_parity(ref_env):
    """get_prob (opt.py:1858-1880): per-feature (skew-)normal log
    densities, broadcast of scalar m/sd/skew, summed per row."""
    import opt as ref_opt

    from optwboundeigenval_tpu.analysis.cov_shift import get_prob

    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 6))

    cases = [
        dict(m=[0], sd=[1], skew=[0]),                       # pure normal
        dict(m=[0.3], sd=[2.0], skew=[0]),                   # scalar bcast
        dict(m=[0, 1, -1, 0.5, 0, 2], sd=[1], skew=[0]),     # vector mean
        dict(m=[0], sd=[1], skew=[4]),                       # skew-normal
        dict(m=[0, 1, -1, 0.5, 0, 2],
             sd=[1, 2, 0.5, 1, 3, 1],
             skew=[4, 0, -3, 1, 0, 2]),                      # full vectors
    ]
    for c in cases:
        ref = ref_opt.get_prob(x.copy(), **c)
        ours = get_prob(x.copy(), **c)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, err_msg=str(c))


def test_test_model_cov_parity(ref_env):
    """test_model_cov (opt.py:1095-1174) on the Forest MLP at identical
    weights: mode selection, exp(log p_test - log p_train) importance
    weights, per-batch wm normalization, weighted acc*100, micro-F1
    with sample weights, and the size*wm batch aggregation."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import convert_forest
    from forest_data import Net
    import opt as ref_opt

    from optwboundeigenval_tpu.analysis.cov_shift import test_model_cov
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    torch.manual_seed(5)
    model = Net()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    rng = np.random.default_rng(5)
    x = rng.normal(size=(300, 54)).astype(np.float32)
    y = rng.integers(0, 7, size=300).astype(np.int64)

    shift = dict(
        test_mean=[0.2] + [0] * 53, test_sd=[1.5] + [1] * 53,
        test_skew=[0] * 54, train_mean=[0] * 54, train_sd=[1] * 54,
        train_skew=[0] * 54,
    )

    ref = ref_opt.OptWBoundEignVal(
        model, nn.CrossEntropyLoss(),
        torch.optim.SGD(model.parameters(), lr=0.1),
        batch_size=128, max_iter=1, use_gpu=False,
    )
    ref_out = ref.test_model_cov(
        torch.from_numpy(x), torch.from_numpy(y), **shift
    )

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    tr = SpectralTrainer(task, __import__(
        "optwboundeigenval_tpu.optim", fromlist=["sgd"]).sgd(0.1),
        batch_size=128, header="COVPAR", log_dir="/tmp/covpar_logs",
        model_dir="/tmp/covpar_models")
    loader_batch = {
        "x": jnp.asarray(x[:128]),
        "y": jnp.asarray(y[:128].astype(np.int32)),
        "w": jnp.ones(128, jnp.float32),
    }
    tr.init_state(loader_batch)
    p0 = tr.params
    tr.params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), p0, convert_forest(sd)
    )
    ours = test_model_cov(tr, x, y.astype(np.int32), **shift)

    for a, b, name in zip(
        ours, ref_out, ("loss", "acc", "f1", "min_w", "max_w")
    ):
        np.testing.assert_allclose(a, b, rtol=2e-5, err_msg=name)


def _forest_pair(torch, seed):
    """Reference Net + our trainer at identical converted weights."""
    import jax
    import jax.numpy as jnp
    import torch.nn as nn

    from benchmarks.parity.jax_driver import convert_forest
    from forest_data import Net
    import opt as ref_opt

    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    torch.manual_seed(seed)
    model = Net()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    ref = ref_opt.OptWBoundEignVal(
        model, nn.CrossEntropyLoss(),
        torch.optim.SGD(model.parameters(), lr=0.1),
        batch_size=128, max_iter=1, use_gpu=False,
    )

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    tr = SpectralTrainer(
        task, sgd(0.1), batch_size=128, header=f"TMPAR{seed}",
        log_dir="/tmp/tmpar_logs", model_dir="/tmp/tmpar_models",
    )
    rng = np.random.default_rng(seed)
    x0 = rng.normal(size=(128, 54)).astype(np.float32)
    tr.init_state({
        "x": jnp.asarray(x0),
        "y": jnp.zeros(128, jnp.int32),
        "w": jnp.ones(128, jnp.float32),
    })
    tr.params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), tr.params, convert_forest(sd)
    )
    return ref, tr


def test_test_model_protocol_parity(ref_env):
    """test_model (opt.py:912-1039) on identical weights/data: weighted
    loss + accuracy + micro-F1, including a partial final batch and the
    class-subset remap path (classes/model_classes)."""
    torch = ref_env

    ref, tr = _forest_pair(torch, seed=6)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(300, 54)).astype(np.float32)  # 300 = 2x128 + 44
    y = rng.integers(0, 7, size=300).astype(np.int64)

    ref_loss, ref_acc, ref_f1 = ref.test_model(
        x=torch.from_numpy(x), y=torch.from_numpy(y)
    )
    loss, acc, f1 = tr.test_model(x=x, y=y.astype(np.int32))
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-5)
    np.testing.assert_allclose(acc, ref_acc, rtol=2e-5)
    np.testing.assert_allclose(f1, ref_f1, rtol=2e-5)

    # class-subset remap (opt.py:555-563): multilabel targets only
    # (the reference indexes target[:, classes] — the CXR comp_test
    # path, W-BCE loss); dataset classes {0,1,2} remap to model
    # columns {4,5,6}
    import torch.nn as nn

    import jax
    import jax.numpy as jnp
    import opt as ref_opt
    from dcnn import W_BCEWithLogitsLoss
    from forest_data import Net
    from benchmarks.parity.jax_driver import convert_forest

    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import weighted_bce_with_logits

    torch.manual_seed(8)
    model2 = Net()
    sd2 = {k: v.numpy().copy() for k, v in model2.state_dict().items()}
    ref2 = ref_opt.OptWBoundEignVal(
        model2, W_BCEWithLogitsLoss(),
        torch.optim.SGD(model2.parameters(), lr=0.1),
        batch_size=128, max_iter=1, use_gpu=False, test_func="acc",
    )
    ym = (rng.random(size=(300, 3)) > 0.5).astype(np.float32)
    ref_out = ref2.test_model(
        x=torch.from_numpy(x), y=torch.from_numpy(ym),
        classes=[0, 1, 2], model_classes=[4, 5, 6],
    )

    # the reference Net softmaxes IN-MODEL (forest_data.py:88), so its
    # W-BCE sees probabilities — wrap ForestNet the same way
    import flax.linen as fnn

    class SoftmaxForest(fnn.Module):
        @fnn.compact
        def __call__(self, xx, train=False):
            return jax.nn.softmax(ForestNet()(xx, train), axis=-1)

    task2 = Task(model=SoftmaxForest(), loss=weighted_bce_with_logits)
    tr2 = SpectralTrainer(
        task2, sgd(0.1), batch_size=128, test_func="acc",
        header="TMPARM", log_dir="/tmp/tmpar_logs",
        model_dir="/tmp/tmpar_models",
    )
    tr2.init_state({
        "x": jnp.asarray(x[:128]),
        "y": jnp.zeros((128, 3), jnp.float32),
        "w": jnp.ones(128, jnp.float32),
    })
    tr2.params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), tr2.params,
        {"ForestNet_0": convert_forest(sd2)},
    )
    ours = tr2.test_model(
        x=x, y=ym, classes=[0, 1, 2], model_classes=[4, 5, 6],
    )
    for a, b, name in zip(ours, ref_out, ("loss", "acc", "f1")):
        np.testing.assert_allclose(a, b, rtol=2e-5, err_msg=name)


def test_vae_loss_parity(ref_env):
    """VLoss (dcnn.py:403-414): W-BCE reconstruction + w * KL."""
    torch = ref_env

    from dcnn import VLoss

    from optwboundeigenval_tpu.models.vae import vae_loss

    rng = np.random.default_rng(7)
    logits = rng.normal(size=(8, 40)).astype(np.float32)
    target = (rng.random(size=(8, 40)) > 0.5).astype(np.float32)
    mu = rng.normal(size=(8, 5)).astype(np.float32)
    logvar = rng.normal(size=(8, 5)).astype(np.float32)

    for w in (0.0, 0.3):
        ref = float(VLoss(w=w)(
            torch.from_numpy(logits), torch.from_numpy(target),
            torch.from_numpy(mu), torch.from_numpy(logvar),
        ))
        ours = float(vae_loss((logits, mu, logvar), target, kl_weight=w))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, err_msg=f"w={w}")


def test_auc_metric_path_parity(ref_env):
    """test_model 'auc sigmoid' dispatch (opt.py:1001-1028): per-class
    ROC-AUC with NaN-label masking + per-class F1 at 0.5, aggregated
    as (nanmean AUC, mean F1)."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp
    import flax.linen as fnn

    from benchmarks.parity.jax_driver import convert_forest
    from dcnn import W_BCEWithLogitsLoss
    from forest_data import Net
    import opt as ref_opt

    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import weighted_bce_with_logits

    torch.manual_seed(9)
    model = Net()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    ref = ref_opt.OptWBoundEignVal(
        model, W_BCEWithLogitsLoss(),
        torch.optim.SGD(model.parameters(), lr=0.1),
        batch_size=128, max_iter=1, use_gpu=False,
        test_func="acc auc sigmoid",
    )
    rng = np.random.default_rng(9)
    x = rng.normal(size=(300, 54)).astype(np.float32)
    ym = (rng.random(size=(300, 7)) > 0.5).astype(np.float32)
    ym[rng.random(size=ym.shape) < 0.1] = np.nan  # NaN-label masking

    ref_out = ref.test_model(x=torch.from_numpy(x), y=torch.from_numpy(ym))

    class SoftmaxForest(fnn.Module):
        @fnn.compact
        def __call__(self, xx, train=False):
            return jax.nn.softmax(ForestNet()(xx, train), axis=-1)

    task = Task(model=SoftmaxForest(), loss=weighted_bce_with_logits)
    tr = SpectralTrainer(
        task, sgd(0.1), batch_size=128, test_func="acc auc sigmoid",
        header="AUCPAR", log_dir="/tmp/tmpar_logs",
        model_dir="/tmp/tmpar_models",
    )
    tr.init_state({
        "x": jnp.asarray(x[:128]),
        "y": jnp.zeros((128, 7), jnp.float32),
        "w": jnp.ones(128, jnp.float32),
    })
    tr.params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), tr.params,
        {"ForestNet_0": convert_forest(sd)},
    )
    ours = tr.test_model(x=x, y=ym)
    for a, b, name in zip(ours, ref_out, ("loss", "auc", "f1")):
        np.testing.assert_allclose(a, b, rtol=2e-5, err_msg=name)


def test_nearest_distance_parity(ref_env):
    """distance.py math (distance.py:43-50): per-sample min euclidean /
    max cosine similarity against the reference set."""
    from scipy.spatial import distance_matrix
    from sklearn.metrics.pairwise import cosine_similarity

    from optwboundeigenval_tpu.analysis.distance import nearest_distances

    rng = np.random.default_rng(10)
    ref = rng.normal(size=(40, 256)).astype(np.float32)
    smp = rng.normal(size=(25, 256)).astype(np.float32)

    dm = distance_matrix(ref, smp)
    np.testing.assert_allclose(
        nearest_distances(ref, smp, dist="euclid"),
        np.min(dm, axis=0), rtol=1e-4,
    )
    cs = cosine_similarity(ref, smp)
    np.testing.assert_allclose(
        nearest_distances(ref, smp, dist="cosine"),
        np.max(cs, axis=0), rtol=1e-4, atol=1e-6,
    )


def test_saliency_gradient_parity(ref_env):
    """saliency (opt.py:1259-1312): input gradient of the max-class
    output on the USPS CNN at identical weights."""
    torch = ref_env

    import jax
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import convert_usps
    from usps_data import CNN

    from optwboundeigenval_tpu.analysis.saliency import saliency_maps
    from optwboundeigenval_tpu.models import CNNUSPS
    from optwboundeigenval_tpu.train import Task

    torch.manual_seed(11)
    tmodel = CNN()
    sd = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(11)
    x = rng.normal(size=(4, 256)).astype(np.float32)

    # reference-style: grad of output[:, argmax] wrt input
    tmodel.eval()
    xt = torch.from_numpy(x.copy())
    xt.requires_grad_()
    out = tmodel(xt)
    cls = out.argmax(dim=1)
    out.gather(1, cls[:, None]).sum().backward()
    ref_grads = xt.grad.numpy()

    task = Task(model=CNNUSPS())
    params0, _ = task.init(
        jax.random.PRNGKey(0), jnp.asarray(x.reshape(-1, 16, 16, 1))
    )
    params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), params0, convert_usps(sd)
    )
    # our model takes NHWC and emits logits; the reference net softmaxes
    # in-model, but argmax and d(softmax_c)/dx vs d(logit_c)/dx differ —
    # compare through the same composition: softmax the logits
    def score(img, c):
        out = task.model.apply(
            {"params": params}, img[None], train=False
        )[0]
        return jax.nn.softmax(out)[c]

    xh = jnp.asarray(x.reshape(-1, 16, 16, 1))
    logits = task.model.apply({"params": params}, xh, train=False)
    cls_j = jnp.argmax(logits, axis=1)
    grads = jax.vmap(jax.grad(score), in_axes=(0, 0))(xh, cls_j)
    ours = np.asarray(grads).reshape(4, 16, 16)

    np.testing.assert_allclose(
        ours, ref_grads.reshape(4, 16, 16), rtol=1e-3, atol=1e-6
    )


def test_f1_max_cutoff_parity(ref_env):
    """jaccard threshold selection (opt.py:1460-1465): per-class PR
    curve, F1 = 2pr/(p+r), threshold at nanargmax."""
    from sklearn.metrics import precision_recall_curve

    from optwboundeigenval_tpu.analysis.jaccard import f1_max_cutoffs

    rng = np.random.default_rng(12)
    labels = (rng.random(size=(200, 5)) > 0.6).astype(float)
    labels[rng.random(size=labels.shape) < 0.05] = np.nan
    scores = rng.random(size=(200, 5))

    ours = f1_max_cutoffs(labels, scores)
    for i in range(5):
        li, si = labels[:, i], scores[:, i]
        good = li == li  # the reference masks NaN labels upstream
        li, si = li[good], si[good]
        np.seterr(invalid="ignore")
        precision, recall, thresholds = precision_recall_curve(li, si)
        f1 = np.divide(2 * precision * recall, precision + recall)
        expect = thresholds[np.nanargmax(f1)]  # opt.py:1462-1465 verbatim math
        np.testing.assert_allclose(ours[i], expect, err_msg=f"class {i}")


def test_rho_test_protocol_parity(ref_env, tmp_path):
    """rho_test (opt.py:882-910): per-batch (rho, norm, iters,
    res_change) CSV with the eigenvector carried batch to batch, at
    identical weights on identical batches."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import convert_forest
    from forest_data import Net
    import opt as ref_opt

    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    torch.manual_seed(13)
    model = Net()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    rng = np.random.default_rng(13)
    x = rng.normal(size=(256, 54)).astype(np.float32)
    y = rng.integers(0, 7, size=256).astype(np.int64)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    try:
        ref = ref_opt.OptWBoundEignVal(
            model, nn.CrossEntropyLoss(),
            torch.optim.SGD(model.parameters(), lr=0.1),
            batch_size=64, max_iter=1, use_gpu=False,
            pow_iter_eps=1e-3, max_pow_iter=100, ignore_bad_vals=False,
        )
        ref.rho_test(x=torch.from_numpy(x), y=torch.from_numpy(y))
        ref_csv = np.loadtxt(f"logs/{ref.header2}_rho_test.csv",
                             delimiter=",")
    finally:
        os.chdir(cwd)

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    tr = SpectralTrainer(
        task, sgd(0.1), batch_size=64, pow_iter_eps=1e-3,
        max_pow_iter=100, ignore_bad_vals=False, header="RHOPAR",
        log_dir=str(tmp_path / "jlogs"), model_dir=str(tmp_path / "jmodels"),
    )
    loader = ArrayLoader(x, y.astype(np.int32), batch_size=64,
                         shuffle=False)
    tr.init_state(next(iter(loader)))
    tr.params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), tr.params, convert_forest(sd)
    )
    tr.rho_test(loader=loader)
    our_csv = np.loadtxt(
        str(tmp_path / "jlogs" / f"{tr.header2}_rho_test.csv"),
        delimiter=",",
    )

    assert our_csv.shape == ref_csv.shape == (4, 6)
    # columns: batch, rho, norm, iters, res_change, time (time excluded)
    np.testing.assert_allclose(our_csv[:, 1], ref_csv[:, 1], rtol=1e-4,
                               err_msg="rho")
    # the reference's iters column is the 0-based loop index at break
    # (a loop-variable leak, opt.py:905); ours is the HVP count —
    # exactly one more (documented in PARITY.md)
    np.testing.assert_allclose(our_csv[:, 3], ref_csv[:, 3] + 1,
                               err_msg="iters")
    np.testing.assert_allclose(our_csv[:, 2], ref_csv[:, 2], rtol=1e-2,
                               atol=1e-5, err_msg="norm")


def test_comp_test_intersection_parity(ref_env):
    """comp_test class intersection (opt.py:1200-1215): overlap ordered
    by loader-0's class order, model_classes = positions in loader-0,
    per-loader classes = positions in that loader."""
    from optwboundeigenval_tpu.analysis.comp import intersect_classes

    d0 = {"b": 0, "a": 1, "c": 2, "z": 3}
    d1 = {"c": 0, "q": 1, "a": 2, "b": 3}
    d2 = {"a": 0, "b": 1, "c": 2}
    dicts = [d0, d1, d2]

    # the reference's verbatim expressions (opt.py:1200-1215)
    classes = [d.keys() for d in dicts]
    overlap = list(classes[0])
    for c in classes[1:]:
        overlap = [x for x in overlap if x in c]
    mc = [x for x in range(len(classes[0])) if list(classes[0])[x] in overlap]
    per_loader = [
        [list(classes[i]).index(x) for x in overlap]
        for i in range(len(dicts))
    ]

    remaps = intersect_classes(dicts)
    assert [list(r.keys()) for r in remaps] == [overlap] * 3
    assert [list(r.values()) for r in remaps] == per_loader
    # model_classes: positions of overlap in loader 0
    assert list(remaps[0].values()) == mc


def test_gan_mlp_forward_parity(ref_env):
    """cGAN MLP forward h2h (gan.py:53-107; the script trains at import
    so its classes are replicated verbatim here, including the
    BatchNorm1d(n, 0.8) call whose second positional arg is EPS — the
    PyTorch-GAN quirk): generator (train + eval modes) and
    discriminator outputs must match at identical weights."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from optwboundeigenval_tpu.models.gan import (
        MLPDiscriminator,
        MLPGenerator,
    )

    n, n_classes, latent_dim, img_shape = 32, 10, 100, (16, 16, 1)

    class RefGenerator(nn.Module):
        def __init__(self):
            super().__init__()
            self.label_emb = nn.Embedding(n_classes, n_classes)

            def block(i, o, normalize=True):
                layers = [nn.Linear(i, o)]
                if normalize:
                    layers.append(nn.BatchNorm1d(o, 0.8))  # eps=0.8!
                layers.append(nn.LeakyReLU(0.2, inplace=True))
                return layers

            self.model = nn.Sequential(
                *block(latent_dim + n_classes, n, normalize=False),
                *block(n, n * 2), *block(n * 2, n * 4),
                *block(n * 4, n * 8),
                nn.Linear(n * 8, 256), nn.Tanh(),
            )

        def forward(self, z, labels):
            x = torch.cat((self.label_emb(labels), z), -1)
            return self.model(x).view(-1, 16, 16)

    class RefDiscriminator(nn.Module):
        def __init__(self):
            super().__init__()
            self.label_embedding = nn.Embedding(n_classes, n_classes)
            self.model = nn.Sequential(
                nn.Linear(n_classes + 256, n * 4), nn.LeakyReLU(0.2, True),
                nn.Linear(n * 4, n * 4), nn.Dropout(0.4),
                nn.LeakyReLU(0.2, True),
                nn.Linear(n * 4, n * 4), nn.Dropout(0.4),
                nn.LeakyReLU(0.2, True),
                nn.Linear(n * 4, 1), nn.Sigmoid(),
            )

        def forward(self, img, labels):
            d_in = torch.cat(
                (img.view(img.size(0), -1),
                 self.label_embedding(labels)), -1)
            return self.model(d_in)

    from optwboundeigenval_tpu.utils.torch_interop import dense_from_torch

    torch.manual_seed(17)
    g_t, d_t = RefGenerator(), RefDiscriminator()
    gsd = {k: v.numpy().copy() for k, v in g_t.state_dict().items()}
    dsd = {k: v.numpy().copy() for k, v in d_t.state_dict().items()}

    rng = np.random.default_rng(17)
    z = rng.normal(size=(8, latent_dim)).astype(np.float32)
    labels = rng.integers(0, n_classes, size=8)
    imgs = rng.normal(size=(8, 16, 16, 1)).astype(np.float32)

    # --- generator ---
    gen = MLPGenerator(n=n, img_shape=img_shape)
    gv = dict(gen.init(jax.random.PRNGKey(0), jnp.asarray(z),
                       jnp.asarray(labels.astype(np.int32)), train=False))
    params = {"Embed_0": {"embedding": gsd["label_emb.weight"]}}
    stats = {}
    for j, lin in enumerate((0, 2, 5, 8, 11)):
        params[f"Dense_{j}"] = dense_from_torch(
            gsd[f"model.{lin}.weight"], gsd[f"model.{lin}.bias"])
    for j, bn in enumerate((3, 6, 9)):
        params[f"BatchNorm_{j}"] = {
            "scale": gsd[f"model.{bn}.weight"],
            "bias": gsd[f"model.{bn}.bias"],
        }
        stats[f"BatchNorm_{j}"] = {
            "mean": gsd[f"model.{bn}.running_mean"],
            "var": gsd[f"model.{bn}.running_var"],
        }
    gv = {
        "params": jax.tree.map(
            lambda t, v: jnp.asarray(v, t.dtype), gv["params"], params),
        "batch_stats": jax.tree.map(
            lambda t, v: jnp.asarray(v, t.dtype), gv["batch_stats"], stats),
    }

    # eval mode (running stats)
    g_t.eval()
    with torch.no_grad():
        ref_imgs = g_t(torch.from_numpy(z),
                       torch.from_numpy(labels)).numpy()
    out = gen.apply(gv, jnp.asarray(z),
                    jnp.asarray(labels.astype(np.int32)), train=False)
    np.testing.assert_allclose(
        np.asarray(out)[..., 0], ref_imgs, rtol=1e-4, atol=1e-5)

    # train mode (batch statistics through eps=0.8)
    g_t.train()
    with torch.no_grad():
        ref_imgs_tr = g_t(torch.from_numpy(z),
                          torch.from_numpy(labels)).numpy()
    out_tr, _ = gen.apply(
        gv, jnp.asarray(z), jnp.asarray(labels.astype(np.int32)),
        train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_tr)[..., 0], ref_imgs_tr, rtol=1e-4, atol=1e-5)

    # --- discriminator (eval: dropout off, sigmoid vs logits) ---
    disc = MLPDiscriminator(n=n)
    dv = dict(disc.init(jax.random.PRNGKey(0), jnp.asarray(imgs),
                        jnp.asarray(labels.astype(np.int32)), train=False))
    dparams = {"Embed_0": {"embedding": dsd["label_embedding.weight"]}}
    for j, lin in enumerate((0, 2, 5, 8)):
        dparams[f"Dense_{j}"] = dense_from_torch(
            dsd[f"model.{lin}.weight"], dsd[f"model.{lin}.bias"])
    dv = {"params": jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), dv["params"], dparams)}
    d_t.eval()
    with torch.no_grad():
        ref_val = d_t(torch.from_numpy(imgs.reshape(8, -1)),
                      torch.from_numpy(labels)).numpy()
    logits = disc.apply(dv, jnp.asarray(imgs),
                        jnp.asarray(labels.astype(np.int32)), train=False)
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(logits))), ref_val,
        rtol=1e-4, atol=1e-6)


def test_cov_shift_tester_sweep_parity(ref_env, tmp_path):
    """Full cov_shift_tester sweep h2h (opt.py:1890-1936): both sides
    run from the SAME indices CSV over two models (different weights),
    loading their best checkpoints per draw — the acc and f1 CSVs must
    match."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import convert_forest
    from forest_data import Net
    import opt as ref_opt

    from optwboundeigenval_tpu.analysis.cov_shift import cov_shift_tester
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    rng = np.random.default_rng(18)
    x = rng.normal(size=(200, 54)).astype(np.float32)
    y = rng.integers(0, 7, size=200).astype(np.int64)
    iters = 3
    idx = np.zeros((54, iters))
    idx[:5, :] = 0.1 * rng.normal(size=(5, iters))
    idx_csv = tmp_path / "indices.csv"
    np.savetxt(idx_csv, idx, delimiter=",")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    os.makedirs("models", exist_ok=True)
    try:
        ref_models, our_models = [], []
        for seed in (20, 21):
            torch.manual_seed(seed)
            model = Net()
            sd = {k: v.numpy().copy()
                  for k, v in model.state_dict().items()}
            ref = ref_opt.OptWBoundEignVal(
                model, nn.CrossEntropyLoss(),
                torch.optim.SGD(model.parameters(), lr=0.1),
                batch_size=64, max_iter=1, use_gpu=False,
                header=f"CSPAR{seed}",
            )
            torch.save(model.state_dict(),
                       f"./models/{ref.header2}_trained_model_best.pt")
            ref_models.append(ref)

            task = Task(model=ForestNet(),
                        loss=cross_entropy_double_softmax)
            tr = SpectralTrainer(
                task, sgd(0.1), batch_size=64, header=f"CSPAR{seed}",
                log_dir=str(tmp_path / "jlogs"),
                model_dir=str(tmp_path / "jmodels"),
            )
            tr.init_state({
                "x": jnp.asarray(x[:64]),
                "y": jnp.zeros(64, jnp.int32),
                "w": jnp.ones(64, jnp.float32),
            })
            tr.params = jax.tree.map(
                lambda t, v: jnp.asarray(v, t.dtype), tr.params,
                convert_forest(sd),
            )
            tr.save("_trained_model_best.msgpack")
            our_models.append(tr)

        ref_opt.cov_shift_tester(
            ref_models, torch.from_numpy(x), torch.from_numpy(y),
            iters=iters, header="CSPAR", mean_diff=1.0, sd_diff=0.5,
            indices=str(idx_csv),
        )
        ref_acc = np.loadtxt("./logs/CSPAR_cov_shift_acc.csv",
                             delimiter=",")
        ref_f1 = np.loadtxt("./logs/CSPAR_cov_shift_f1.csv",
                            delimiter=",")
    finally:
        os.chdir(cwd)

    acc, f1, _ = cov_shift_tester(
        our_models, x, y.astype(np.int32), iters=iters, header="CSPAR",
        mean_diff=1.0, sd_diff=0.5, indices=str(idx_csv),
        log_dir=str(tmp_path / "jlogs"),
    )
    np.testing.assert_allclose(acc, ref_acc, rtol=2e-5, err_msg="acc")
    np.testing.assert_allclose(f1, ref_f1, rtol=2e-5, err_msg="f1")
