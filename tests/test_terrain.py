"""Terrain generator + query tests (replaces isaacgym.terrain_utils usage,
reference utils/terrain.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from booster_gym_tpu.terrain import Terrain

CFG = {
    "type": "trimesh", "static_friction": 1.0, "dynamic_friction": 1.0,
    "restitution": 0.0, "terrain_length": 10.0, "terrain_width": 10.0,
    "border_size": 5.0, "num_terrains": 8,
    "terrain_proportions": [0.0, 0.0, 0.5, 0.5],
    "slope": 0.1, "random_height": 0.1, "discrete_height": 0.02,
    "horizontal_scale": 0.1, "vertical_scale": 0.005, "slope_threshold": 2.0,
}


@pytest.fixture(scope="module")
def terrain():
    return Terrain(CFG, seed=3)


def test_heightfield_shape_and_border(terrain):
    # 8 tiles x 100 px + 2 x 50 border, 100 + 2 x 50 (utils/terrain.py:39-46)
    assert terrain.height_field.shape == (900, 200)
    hf = np.asarray(terrain.height_field)
    # borders are flat zero
    assert np.all(hf[:50, :] == 0) and np.all(hf[:, :50] == 0)


def test_tile_proportions(terrain):
    hf = np.asarray(terrain.height_field)
    # first 4 tiles random_uniform (nonzero everywhere-ish), last 4 discrete
    random_tile = hf[50 + 100:50 + 200, 50:150]
    assert np.std(random_tile) > 0.005
    assert np.abs(random_tile).max() <= 0.05 + 1e-6  # ±random_height/2
    discrete_tile = hf[50 + 4 * 100:50 + 5 * 100, 50:150]
    levels = np.unique(np.round(discrete_tile, 4))
    assert len(levels) <= 5  # plateaus at +-h, +-h/2, 0
    assert np.abs(discrete_tile).max() <= 0.02 + 1e-6


def test_height_query_matches_reference_indexing(terrain):
    """The bilinear query must reproduce the reference's indexing
    (utils/terrain.py:105-121): world (0,0) -> pixel border_pixels."""
    hf = np.asarray(terrain.height_field)
    xy = jnp.asarray([[0.0, 0.0], [1.0, 2.0], [10.05, 5.05]])
    h = np.asarray(terrain.heights(xy))
    np.testing.assert_allclose(h[0], hf[50, 50], atol=1e-6)
    np.testing.assert_allclose(h[1], hf[60, 70], atol=1e-6)
    # midpoint: average of the 4 surrounding pixels
    corners = hf[150:152, 100:102]
    np.testing.assert_allclose(h[2], corners.mean(), atol=1e-6)


def test_normals_unit_and_upward(terrain):
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(0, 70, (256, 2)))
    n = np.asarray(terrain.normals(xy))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    assert np.all(n[:, 2] > 0.5)


def test_fused_matches_separate(terrain):
    rng = np.random.default_rng(1)
    xy = jnp.asarray(rng.uniform(-3, 75, (128, 2)))
    h1 = np.asarray(terrain.heights(xy))
    n1 = np.asarray(terrain.normals(xy))
    h2, n2 = terrain.heights_and_normals(xy)
    np.testing.assert_allclose(h1, np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(n1, np.asarray(n2), atol=1e-6)


def test_plane_queries():
    t = Terrain({"type": "plane", "static_friction": 1.0, "restitution": 0.0})
    xy = jnp.zeros((4, 2))
    assert np.all(np.asarray(t.heights(xy)) == 0)
    n = np.asarray(t.normals(xy))
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (4, 1)))
    h, nn = t.heights_and_normals(xy)
    assert np.all(np.asarray(h) == 0)



def test_sampler_kernel_matches_direct(terrain):
    """The Pallas terrain-sampling pipeline (DMA patch staging + one-hot
    bilinear, terrain/sample_kernel.py) is bilinear-exact vs the direct
    gather path for points within the patch radius of each root."""
    from booster_gym_tpu.terrain.sample_kernel import (
        build_shift_table,
        make_terrain_sampler,
    )
    from booster_gym_tpu.utils.compile import jit_nofusion

    table = build_shift_table(terrain.height_field)
    B, N = 256, 33
    rng = np.random.default_rng(3)
    root = jnp.asarray(rng.uniform(5, 55, (B, 2)), jnp.float32)
    pts = root[:, None, :] + jnp.asarray(
        rng.uniform(-0.55, 0.55, (B, N, 2)), jnp.float32)
    sample = jit_nofusion(make_terrain_sampler(terrain, N, interpret=True))
    h, n = sample(table, root, pts)
    h_ref, n_ref = terrain.heights_and_normals(pts)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref), atol=2e-5)


def test_sampler_kernel_under_shard_map(terrain):
    """The sampler shard_maps over an 8-device ("dp",) mesh exactly the way
    envs/t1.py._sample_terrain wires it for multi-chip rough terrain: table
    replicated, per-env queries sharded, results equal to the direct path."""
    import jax
    from jax.sharding import PartitionSpec as P

    from booster_gym_tpu.parallel import make_mesh
    from booster_gym_tpu.terrain.sample_kernel import (
        build_shift_table,
        make_terrain_sampler,
    )
    from booster_gym_tpu.utils.compile import jit_nofusion

    table = build_shift_table(terrain.height_field)
    B, N = 256, 9
    rng = np.random.default_rng(5)
    root = jnp.asarray(rng.uniform(5, 55, (B, 2)), jnp.float32)
    pts = root[:, None, :] + jnp.asarray(
        rng.uniform(-0.55, 0.55, (B, N, 2)), jnp.float32)

    mesh = make_mesh(8)
    sampler = make_terrain_sampler(terrain, N, interpret=True)
    sharded = jit_nofusion(jax.shard_map(
        sampler, mesh=mesh, in_specs=(P(), P("dp"), P("dp")),
        out_specs=P("dp"), check_vma=False))
    h, n = sharded(table, root, pts)
    assert len(h.sharding.device_set) == 8
    h_ref, n_ref = terrain.heights_and_normals(pts)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref), atol=2e-5)
