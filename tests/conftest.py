import os
import sys

# Force the CPU backend with a virtual 8-device mesh for sharding tests.
# Real-TPU behavior is exercised by bench.py / __graft_entry__.py, plus the
# opt-in real-chip lane: ZEEKSTD_TPU_TESTS=1 pytest tests/test_tpu_real.py
# keeps the TPU backend live (interpret mode cannot catch stale-SMEM bugs —
# docs/PERF.md). Only run that one file under the flag; the rest of the
# suite expects the CPU backend.
# NOTE: the plural JAX_PLATFORMS env var is overridden by the axon TPU
# plugin on this machine; the singular JAX_PLATFORM_NAME (and the
# jax_platforms config) do take effect.
_REAL_TPU_LANE = os.environ.get("ZEEKSTD_TPU_TESTS") == "1"
if not _REAL_TPU_LANE:
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    if _REAL_TPU_LANE:
        return
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
