"""Test harness configuration.

Tests run on an 8-device virtual CPU mesh (SURVEY.md §4's recommended
strategy) so sharding paths are exercised without TPU hardware. The platform
override must happen in-process: in this container a sitecustomize registers
the axon TPU PJRT plugin at interpreter start, and forcing
``JAX_PLATFORMS=cpu`` in the shell environment wedges that registration.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture()
def L():
    """Per-layer cache accessor working for stacked and tuple layouts."""
    from cold_compress_tpu.models.transformer import layer_cache

    return layer_cache


@pytest.fixture(scope="session")
def tiny_cfg():
    from cold_compress_tpu.models.config import ModelConfig

    return ModelConfig.from_name("TestTiny")


@pytest.fixture(scope="session")
def tiny_model(tiny_cfg):
    """(cfg, params, rope) in f32 for numerics-sensitive tests."""
    import jax.numpy as jnp

    from cold_compress_tpu.models import transformer as T

    params = T.init_params(tiny_cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rope = T.make_rope_table(tiny_cfg)
    return tiny_cfg, params, rope
