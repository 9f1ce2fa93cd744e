"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU analog of testing multi-node code without a cluster
(SURVEY.md §4): all sharding / collective tests run against 8
host-platform devices. The axon TPU plugin (sitecustomize in
/root/.axon_site) registers itself regardless of JAX_PLATFORMS, so we
must also pin the platform through jax.config, not just the env.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
