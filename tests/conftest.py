"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU analog of testing multi-node code without a cluster
(SURVEY.md §4): all sharding / collective tests run against
8 host-platform devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
