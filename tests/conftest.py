"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (the driver benches on the real chip)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# CPU-only cache dir, fingerprinted by host CPU features: persistent-cache
# artifacts are AOT results tagged with the compiling host's CPU features;
# entries from a different host (or the TPU plugin context) fail to load
# with SIGILL/feature warnings and force cold compiles (the round-4
# dryrun/suite timeout).  Each host uses its own subdirectory.
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zkpos_tpu.utils.cache import enable_cpu_cache
import jax
# NOTE: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")
enable_cpu_cache(jax)
