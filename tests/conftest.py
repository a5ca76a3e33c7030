"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (see repo README)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env sets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def _machine_cache_dir():
    """Per-CPU-fingerprint compilation cache.

    The persistent cache key does NOT include the host's CPU features; an
    executable AOT-compiled on a previous sandbox host gets loaded here
    with mismatched features (xla cpu_aot_loader warns about SIGILL risk)
    and produces 1-ulp float-contraction differences that break the
    bit-exactness tests (sharded == single-device). Keying the cache dir
    by the feature set makes stale cross-machine entries unreachable."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.sha1(line.encode()).hexdigest()[:12]
                    break
            else:
                fp = "nofl"
    except OSError:
        fp = "nocpuinfo"
    return f"/tmp/jax_cache_{fp}"


_CACHE = _machine_cache_dir()
os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE

import jax  # noqa: E402

# The sandbox's sitecustomize registers the axon (TPU) backend and overrides
# JAX_PLATFORMS at interpreter start; forcing the config post-import wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

