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

# Persistent compilation cache: the suite compiles dozens of CPU programs
# (~40 min cold); cached reruns take a few minutes.
import os as _os
jax.config.update('jax_compilation_cache_dir',
                  _os.path.expanduser('~/.cache/mmdt_xla_cpu_tests'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
