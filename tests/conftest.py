"""Force the CPU backend with 8 virtual devices for all tests.

Multi-chip sharding tests run on a virtual CPU mesh
(SURVEY.md §4.7 — the reference has no multi-node analog).
Must run before jax is imported anywhere.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
# skip the axon TPU-tunnel PJRT handshake entirely for CPU test runs —
# it can hang for minutes when another process holds the relay
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# persistent jit cache (PTX-cache analog) across test runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
