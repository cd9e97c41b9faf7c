"""Data-parallel sharding over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from ffwm_tpu.parallel import (
    batch_sharding,
    drop_remainder,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh()


def test_shard_batch_places_on_all_devices(mesh, rng):
    batch = {"x": rng.rand(16, 8, 8, 3).astype(np.float32)}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_pad_to_multiple(rng):
    batch = {"x": rng.rand(13, 4).astype(np.float32)}
    padded, n = pad_to_multiple(batch, 8)
    assert n == 13 and padded["x"].shape[0] == 16
    np.testing.assert_array_equal(padded["x"][:13], batch["x"])
    np.testing.assert_array_equal(padded["x"][13:], np.repeat(batch["x"][-1:], 3, 0))


def test_drop_remainder(rng):
    """Training batches truncate (never pad): padded duplicates would enter
    losses/BN/grad means at full weight — numerics the reference never has."""
    batch = {"x": rng.rand(13, 4).astype(np.float32)}
    kept = drop_remainder(batch, 8)
    assert kept["x"].shape[0] == 8
    np.testing.assert_array_equal(kept["x"], batch["x"][:8])
    assert drop_remainder({"x": batch["x"][:3]}, 8) is None
    same = drop_remainder(batch, 13)
    assert same["x"].shape[0] == 13


def test_check_batch_divisible():
    """batch_size < or not multiple of n_dev would drop EVERY training batch
    (silent no-op epochs, e.g. reference flow default 6 on 8 devices) —
    trainers must fail fast instead."""
    from ffwm_tpu.parallel import check_batch_divisible

    check_batch_divisible(8, 8)
    check_batch_divisible(16, 8)
    check_batch_divisible(6, 1)
    with pytest.raises(SystemExit, match="not a multiple"):
        check_batch_divisible(6, 8)
    with pytest.raises(SystemExit, match="not a multiple"):
        check_batch_divisible(12, 8)


def test_sharded_grid_warp_matches_single_device(mesh, rng):
    """The hot op under GSPMD: sharded batch == unsharded numerics."""
    from ffwm_tpu.ops import warp

    img = rng.rand(8, 32, 32, 3).astype(np.float32)
    flow = (rng.rand(8, 32, 32, 2).astype(np.float32) * 2) - 1
    ref = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    sh = batch_sharding(mesh)
    out = warp(jax.device_put(img, sh), jax.device_put(flow, sh))
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_sharded_flownet_forward(mesh, rng):
    """FlowNet forward over the mesh: batch stays sharded end-to-end and
    matches single-device numerics (BatchNorm eval mode)."""
    from ffwm_tpu.models import FlowNet

    net = FlowNet()
    x = rng.rand(8, 64, 64, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)

    fwd = jax.jit(lambda v, im: net.apply(v, im, train=False)[0])
    ref = np.asarray(fwd(variables, jnp.asarray(x)))

    vrep = replicate(variables, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = fwd(vrep, xs)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_sharded_train_batchnorm_is_global(mesh, rng):
    """Training-mode BatchNorm under GSPMD computes *global* batch stats —
    the cross-replica BN semantics (SURVEY.md §2.7)."""
    from ffwm_tpu.nn import BatchNorm2d

    bn = BatchNorm2d()
    x = rng.randn(8, 4, 4, 3).astype(np.float32) * 3 + 1
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False)

    @jax.jit
    def run(v, im):
        out, updates = bn.apply(v, im, use_running_average=False,
                                mutable=["batch_stats"])
        return out, updates["batch_stats"]["mean"]

    ref_out, ref_mean = run(variables, jnp.asarray(x))
    out, mean = run(replicate(variables, mesh),
                    jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_mosaic_warp_kernel_partitions_over_batch(mesh, rng):
    """The compiled warp kernel's GSPMD spec (custom_partitioning): under a
    batch-sharded mesh the kernel runs per-shard — output stays sharded,
    values match the XLA formulation, and the compiled module contains no
    all-gather of the operands (round-2 advice item: eval previously had to
    fall back to the XLA warp on >1-device meshes). Exercised through the
    interpret kernel (Mosaic needs a TPU); the TPU build shares the same
    partitioning rule."""
    from ffwm_tpu.ops.kernels.warp_vmem_pallas import (
        grid_sample_vmem_sharded_interpret,
    )
    from ffwm_tpu.ops.warp import _grid_sample_patch

    img = jnp.asarray(rng.rand(16, 16, 16, 8).astype(np.float32))
    grid = jnp.asarray((rng.rand(16, 16, 16, 2) * 2.2 - 1.1).astype(np.float32))
    ref = _grid_sample_patch(img, grid, False)

    sh = batch_sharding(mesh)
    f = jax.jit(lambda i, g: grid_sample_vmem_sharded_interpret(i, g, False))
    img_s, grid_s = jax.device_put(img, sh), jax.device_put(grid, sh)
    out = f(img_s, grid_s)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    hlo = f.lower(img_s, grid_s).compile().as_text()
    assert "all-gather" not in hlo

    # mismatched operand shardings (image sharded, grid replicated): the
    # partition rule forces BOTH operands to the image's batch spec, so the
    # kernel still sees matching per-shard batches (round-3 review finding)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    out2 = f(img_s, jax.device_put(grid, rep))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-6)
