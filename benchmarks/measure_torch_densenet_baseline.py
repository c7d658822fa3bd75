"""Torch-CPU reference-pattern HVP baseline for DenseNet-40-12 at batch
32 — the big-model counterpart of measure_torch_baseline.py, used as
``vs_baseline`` by bench.py.

Pattern identical to the reference HVPOperator (opt.py:77-108): f64,
one create-graph gradient cached, repeated ``torch.autograd.grad``
products against it.  The model is the reference's own densenet.py
DenseNet3 (executed as-is from /root/reference, NOT copied).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.parity import _refenv  # noqa: E402

_refenv.install()

import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def main(iters: int = 10):
    from densenet import DenseNet3

    torch.manual_seed(0)
    model = DenseNet3(40, 10, 12, bottleneck=True).double()
    model.train()
    x = torch.randn(32, 3, 32, 32, dtype=torch.float64)
    y = torch.randint(0, 10, (32,))
    loss = F.cross_entropy(model(x), y)
    grads = torch.autograd.grad(loss, list(model.parameters()),
                                create_graph=True)
    gvec = torch.cat([g.reshape(-1) for g in grads])
    n = gvec.numel()
    v = torch.ones(n, dtype=torch.float64) / n ** 0.5

    def hv(v):
        gg = torch.autograd.grad(gvec, list(model.parameters()),
                                 grad_outputs=v, retain_graph=True)
        return torch.cat([g.reshape(-1) for g in gg])

    hv(v)  # warm
    t0 = time.time()
    for _ in range(iters):
        out = hv(v)
        v = out / out.norm()
    dt = time.time() - t0
    print(json.dumps({
        "metric": "torch_cpu_densenet40_hvp_per_sec",
        "value": round(iters / dt, 3),
        "ndim": n,
    }))


if __name__ == "__main__":
    main()
