"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-era analog of "test multi-node without a cluster": the
sharded code paths (psum'd HVPs, pjit'd train steps) execute on 8 XLA
host devices, so the same compiled programs that run on a TPU pod slice
are validated here without hardware.
"""

import os

# NOTE: the image's sitecustomize pre-imports jax with the TPU plugin
# registered, so JAX_PLATFORMS is already latched by the time conftest
# runs — the platform override must go through jax.config.  XLA_FLAGS
# is still read lazily at first backend initialization.
# keep the persistent XLA cache out of CPU test runs (it exists to
# amortize tunneled-TPU compiles; on CPU it only adds AOT-reload noise)
os.environ.setdefault("JAX_DISABLE_COMPILATION_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Oracle tests compare third-order autodiff against dense Hessians; give
# them real float64 on CPU (the reference runs its curvature kernel in
# f64 too, opt.py:83).  Framework code stays dtype-explicit (f32 on TPU).
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    return devs[:8]
