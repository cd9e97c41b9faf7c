"""Legacy pix2pix network zoo (capability parity, inventory #23)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffwm_tpu.models.legacy import define_d, define_g


@pytest.mark.parametrize("arch,size", [("resnet_6blocks", 64), ("unet_128", 128)])
def test_generators(rng, arch, size):
    net = define_g(arch)
    x = jnp.asarray(rng.rand(1, size, size, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    assert y.shape == x.shape
    out = np.asarray(y)
    assert np.isfinite(out).all() and out.min() >= -1 and out.max() <= 1


@pytest.mark.parametrize("arch,expect_hw", [("basic", 6), ("pixel", 64)])
def test_discriminators(rng, arch, expect_hw):
    net = define_d(arch)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    assert y.shape[1] == expect_hw  # 70x70 patchGAN map / per-pixel map
    assert np.isfinite(np.asarray(y)).all()
