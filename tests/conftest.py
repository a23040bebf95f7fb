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
# (~40 min cold); cached reruns take a few minutes. The dir is keyed by a
# host CPU-feature fingerprint: XLA:CPU AOT results embed the build host's
# machine features and loading them on a different host warns about (and
# can SIGILL on) unsupported instructions.
import hashlib as _hashlib
import os as _os


def _cpu_cache_dir(base: str) -> str:
    try:
        with open('/proc/cpuinfo') as f:
            flags = next(ln for ln in f if ln.startswith('flags'))
        tag = _hashlib.md5(flags.encode()).hexdigest()[:8]
    except Exception:
        import platform
        tag = platform.machine() or 'unknown'
    return _os.path.expanduser(f'{base}-{tag}')


jax.config.update('jax_compilation_cache_dir',
                  _cpu_cache_dir('~/.cache/mmdt_xla_cpu_tests'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
