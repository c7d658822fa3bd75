"""Measures the PyTorch-CPU reference-pattern HVP baseline used by
bench.py (TORCH_CPU_BASELINE_HVPS_PER_SEC).

Reproduces the reference's computation pattern — float64, one
create-graph gradient cached and reused, repeated
``torch.autograd.grad`` products against it (HVPOperator,
opt.py:77-108) — on a torch re-implementation of the USPS CNN at
batch 128.  This is a measurement harness, not reference code.

Run: ``python benchmarks/measure_torch_baseline.py``
"""

import json
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class CNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(1, 8, 3, padding=1)
        self.c2 = nn.Conv2d(8, 16, 3, padding=1)
        self.c3 = nn.Conv2d(16, 32, 3, padding=1)
        self.f1 = nn.Linear(128, 64)
        self.f2 = nn.Linear(64, 10)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.c1(x)), 2)
        x = F.max_pool2d(F.relu(self.c2(x)), 2)
        x = F.max_pool2d(F.relu(self.c3(x)), 2)
        x = x.reshape(x.shape[0], -1)
        return self.f2(F.relu(self.f1(x)))


def main(iters: int = 30):
    torch.manual_seed(0)
    model = CNN().double()
    x = torch.randn(128, 1, 16, 16, dtype=torch.float64)
    y = torch.randint(0, 10, (128,))
    loss = F.cross_entropy(model(x), y)
    grads = torch.autograd.grad(loss, list(model.parameters()),
                                create_graph=True)
    gvec = torch.cat([g.reshape(-1) for g in grads])
    v = torch.ones(gvec.numel(), dtype=torch.float64) / gvec.numel() ** 0.5

    def hv(v):
        gg = torch.autograd.grad(gvec, list(model.parameters()),
                                 grad_outputs=v, retain_graph=True)
        return torch.cat([g.reshape(-1) for g in gg])

    hv(v)  # warm
    t0 = time.time()
    for _ in range(iters):
        hv(v)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "torch_cpu_reference_hvp_usps_cnn_batch128",
        "value": round(iters / dt, 2),
        "unit": "HVPs/sec",
        "ndim": int(gvec.numel()),
    }))


if __name__ == "__main__":
    main()
