"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (the driver benches on the real chip)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# CPU-only cache dir: persistent-cache artifacts are tagged with the
# compiling process's detected CPU features; mixing entries written under
# the TPU plugin context with CPU test runs produced AOT loads with
# mismatched features (observed segfault + explicit SIGILL warning from
# cpu_aot_loader).  Tests therefore use their own cache directory.
os.makedirs("/root/repo/.jax_cache_cpu", exist_ok=True)
import jax
# NOTE: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
