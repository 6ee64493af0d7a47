"""Test config: force CPU with 8 virtual devices so mesh/sharding logic is
testable without a TPU pod (SURVEY.md §4 test strategy).

This image's sitecustomize registers the remote 'axon' TPU backend and
explicitly calls jax.config.update("jax_platforms", "axon,cpu") at
interpreter start — which beats JAX_PLATFORMS in the environment. So we
must (a) set XLA_FLAGS before backends initialize and (b) override the
jax_platforms *config* again here, or the whole suite silently runs over
the remote-TPU tunnel (minutes per first-time compile)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# NOTE: do NOT set jax_default_matmul_precision here — the CPU backend is
# already f32-exact, and forcing HIGHEST makes XLA:CPU conv execution ~9x
# slower on this box.
