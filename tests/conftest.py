"""Test bootstrap: force an 8-virtual-device CPU mesh.

The reference could only exercise its distributed paths on real GPUs
(SURVEY.md section 4); JAX lets us compile and run every sharded code path
on N virtual CPU devices.
"""

import os

# force-override: the ambient environment pins JAX_PLATFORMS to the TPU
if not os.environ.get("ACAV_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
