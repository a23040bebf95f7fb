"""Test configuration: force an 8-device virtual CPU mesh.

Note: this environment's axon sitecustomize registers the TPU backend at
interpreter start and overrides the JAX_PLATFORMS env var, so we must force
the platform through jax.config *before* backend initialization.
SURVEY.md section 4: multi-device tests run on CPU via
xla_force_host_platform_device_count; real-TPU behavior is exercised by
bench.py and the driver's graft entry checks.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
