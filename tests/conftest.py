"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: under the axon TPU tunnel the JAX_PLATFORMS env var is not honored,
but jax.config.update('jax_platforms', ...) before first backend use is.
"""

import os

# pin the numpy ray sampler: the native one is contract-identical but has
# a different RNG stream, and outer_sample defaults to auto (use native
# when libfastloader.so is built); tests opt in explicitly where intended
os.environ.setdefault("VQNERF_NATIVE_SAMPLER", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # On low-core hosts the 8 virtual devices' collective participants
    # run SEQUENTIALLY on the thread pool, so the spread between first
    # and last arrival at an all-reduce rendezvous can exceed XLA's
    # 40 s FATAL termination timeout (rendezvous.cc:127 aborts the
    # process "to ensure a consistent program state") — the full-
    # pipeline mesh test died this way on a 1-core VM, reproducibly,
    # including at the untouched r4 HEAD. Raise the fatal timeout (and
    # the warn) far above any legitimate shard compute time.
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
             + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
             ).strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# On low-core hosts the 8 virtual devices' collectives are a hard
# liveness hazard: XLA CPU async dispatch runs an 8-participant
# all-reduce rendezvous on pool threads with a FATAL 40 s termination
# timeout (rendezvous.cc:127 "Exiting to ensure a consistent program
# state"), and a concurrent jit compile on a 1-core box can starve the
# 8th participant past it — the full-pipeline mesh test aborted
# deterministically this way (r5; reproduced on the untouched r4 HEAD,
# so environmental, not a code regression). Synchronous dispatch makes
# execution complete before the main thread can start the next trace,
# removing the overlap. Throughput-irrelevant for tests.
jax.config.update("jax_cpu_enable_async_dispatch", False)


def pytest_configure(config):
    """Build the native libs once per session so test_native.py (and the
    native-sampler training test) run instead of silently skipping in a
    clean checkout (r2 VERDICT weak #7). Build failure -> those tests
    keep their skip markers; everything else is unaffected."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    loader_dir = os.path.join(repo, "native", "fastloader")
    if not os.path.exists(os.path.join(loader_dir, "libfastloader.so")):
        try:
            subprocess.run(["make", "-C", loader_dir], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # keep the skip path on toolchain issues
            print(f"[conftest] native fastloader build failed: {e}")
    aruco_dir = os.path.join(repo, "native", "calibration")
    aruco_bin = os.path.join(aruco_dir, "build", "aruco_calibrate")
    if not os.path.exists(aruco_bin):
        try:
            subprocess.run(
                ["cmake", "-S", aruco_dir, "-B",
                 os.path.join(aruco_dir, "build")],
                check=True, capture_output=True, timeout=120)
            subprocess.run(
                ["cmake", "--build", os.path.join(aruco_dir, "build")],
                check=True, capture_output=True, timeout=300)
        except Exception as e:
            print(f"[conftest] aruco build failed (OpenCV missing is "
                  f"expected): {e}")
