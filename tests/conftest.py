"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way -- with
``xla_force_host_platform_device_count`` -- since real multi-chip hardware is
not available in CI.  float64 is enabled so golden tests can match the
reference's float64 node default (/root/reference/rectipy/nodes.py:120).

The environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU) via
sitecustomize before conftest runs, so the platform must be forced back to
CPU through jax.config, not the environment.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

try:  # prefer the installed package (pip install -e .)
    import rectipy_tpu  # noqa: F401
except ImportError:  # fallback: run from a source checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
