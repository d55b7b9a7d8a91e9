"""Process/environment configuration.

Parity target: `/root/reference/yolox/utils/setup_env.py` —
``configure_nccl`` (InfiniBand env tuning: N/A on TPU, ICI needs no
configuration), ``configure_omp``, and ``configure_module`` (ulimit raise +
cv2 thread/OpenCL clamping so dataloader workers don't oversubscribe).
"""

from __future__ import annotations

import os

__all__ = ["configure_omp", "configure_module", "configure_tpu"]


def configure_omp(num_threads: int = 1):
    """Default OMP_NUM_THREADS to 1 unless the user chose otherwise
    (ref `configure_omp:28-48`)."""
    if "OMP_NUM_THREADS" not in os.environ and num_threads == 1:
        os.environ["OMP_NUM_THREADS"] = str(num_threads)


def _raise_open_file_limit(soft_target: int):
    """Loader worker pools hold many fds; lift the soft NOFILE limit."""
    import resource

    _, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    resource.setrlimit(resource.RLIMIT_NOFILE, (soft_target, hard))


def _clamp_cv2_parallelism():
    """cv2 in loader workers must not spawn its own thread pools."""
    import cv2

    cv2.setNumThreads(0)
    cv2.ocl.setUseOpenCL(False)


def configure_module(ulimit_value: int = 8192):
    """Raise the open-file limit and clamp cv2 threading
    (ref `configure_module:51-77`).  Both are best-effort."""
    for step in (
        lambda: _raise_open_file_limit(ulimit_value),
        _clamp_cv2_parallelism,
    ):
        try:
            step()
        except Exception:
            pass


def configure_tpu():
    """TPU-runtime knobs (the `configure_nccl` slot): nothing to tune for
    ICI; kept as the hook where XLA flags would go."""
    return None


def cpu_cache_key() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA-CPU's persistent cache stores AOT-compiled machine code; loading
    an artifact compiled on a CPU with different features emits
    `cpu_aot_loader` errors (and risks SIGILL).  Keying the cache dir by
    the feature flags makes a foreign machine compile cold into its own
    subdir instead of tripping over artifacts this host built.
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir=None, per_cpu: bool = False):
    """Persist XLA compiles (multiscale training touches many shape
    buckets; each 640 px step costs minutes to compile over a device
    tunnel).  Shared by both trainers.

    ``per_cpu=True`` appends a CPU-feature fingerprint subdir — use for
    CPU-backend caches that may travel between machines (see
    :func:`cpu_cache_key`)."""
    import os

    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.getcwd(), ".jax_cache"),
    )
    if per_cpu:
        cache_dir = os.path.join(cache_dir, f"cpu-{cpu_cache_key()}")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return cache_dir
