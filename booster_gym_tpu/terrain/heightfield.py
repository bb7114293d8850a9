"""Terrain: heightfield generation + on-device queries.

Replaces the reference's Terrain (reference: utils/terrain.py) and the
isaacgym.terrain_utils generators it calls (utils/terrain.py:53-88).  Two
TPU-first changes:

  * height/normal queries are pure jnp bilinear interpolation over an
    on-device array — the reference round-trips GPU->CPU NumPy->GPU on every
    query (utils/terrain.py:105-121), which SURVEY.md flags as the
    anti-pattern to fix;
  * contact consumes the heightfield directly (depth + normal per sample
    point) instead of a triangle mesh, so there is no mesh data structure at
    all.  The reference's own height queries also read the raw heightfield,
    so obs/reward semantics are identical; only near-vertical "wall"
    artifacts of its trimesh conversion (slope_threshold,
    utils/terrain.py:86-88) differ.

Generators reproduce the semantics of the four tile types selected by
terrain_proportions (envs/T1.yaml:107): plane, pyramid_slope,
random_uniform, discrete_obstacles.
"""

import numpy as np
import jax.numpy as jnp


def _pyramid_sloped(h, slope, horizontal_scale, vertical_px, platform_size=3.0):
    """Product-pyramid slope with a flat central platform (semantics of
    isaacgym.terrain_utils.pyramid_sloped_terrain)."""
    nx, ny = h.shape
    cx, cy = nx // 2, ny // 2
    x = (cx - np.abs(cx - np.arange(nx))) / cx
    y = (cy - np.abs(cy - np.arange(ny))) / cy
    max_h = slope * horizontal_scale * cx / vertical_px  # in raw units
    h += (max_h * x[:, None] * y[None, :]).astype(h.dtype)
    ps = int(platform_size / horizontal_scale / 2)
    x1, x2 = cx - ps, cx + ps
    y1, y2 = cy - ps, cy + ps
    platform_h = h[x1, y1]
    lo, hi = min(platform_h, 0), max(platform_h, 0)
    np.clip(h, lo, hi, out=h)
    return h


def _random_uniform(h, rng, min_height, max_height, step, downsampled_scale,
                    horizontal_scale, vertical_px):
    """Random heights on a coarse grid, bilinearly upsampled (semantics of
    isaacgym.terrain_utils.random_uniform_terrain)."""
    nx, ny = h.shape
    levels = np.arange(min_height, max_height + step, step) / vertical_px
    dx = max(1, int(nx * horizontal_scale / downsampled_scale))
    dy = max(1, int(ny * horizontal_scale / downsampled_scale))
    coarse = rng.choice(levels, size=(dx, dy))
    # bilinear upsample coarse -> (nx, ny)
    xi = np.linspace(0, dx - 1, nx)
    yi = np.linspace(0, dy - 1, ny)
    x0 = np.clip(xi.astype(int), 0, dx - 2)
    y0 = np.clip(yi.astype(int), 0, dy - 2)
    fx = (xi - x0)[:, None]
    fy = (yi - y0)[None, :]
    up = (
        coarse[x0][:, y0] * (1 - fx) * (1 - fy)
        + coarse[x0 + 1][:, y0] * fx * (1 - fy)
        + coarse[x0][:, y0 + 1] * (1 - fx) * fy
        + coarse[x0 + 1][:, y0 + 1] * fx * fy
    )
    h += up.astype(h.dtype)
    return h


def _discrete_obstacles(h, rng, max_height, min_size, max_size, num_rects,
                        horizontal_scale, vertical_px, platform_size=3.0):
    """Random raised/sunken rectangles + flat central platform (semantics of
    isaacgym.terrain_utils.discrete_obstacles_terrain)."""
    nx, ny = h.shape
    hm = max_height / vertical_px
    heights = np.array([-hm, -hm / 2, hm / 2, hm])
    for _ in range(num_rects):
        w = int(rng.uniform(min_size, max_size) / horizontal_scale)
        l = int(rng.uniform(min_size, max_size) / horizontal_scale)
        x = rng.integers(0, max(1, nx - w))
        y = rng.integers(0, max(1, ny - l))
        h[x:x + w, y:y + l] = rng.choice(heights)
    ps = int(platform_size / horizontal_scale / 2)
    cx, cy = nx // 2, ny // 2
    h[cx - ps:cx + ps, cy - ps:cy + ps] = 0
    return h


class Terrain:
    """Static terrain shared by all envs.

    heights()/normals() are jit-traceable; hot paths should pass the
    heightfield explicitly (hf=...) so it enters the program as a traced
    operand rather than an embedded constant (see heights()).  World (0,0)
    maps to grid index border_pixels exactly as in the reference query
    (utils/terrain.py:107-108).
    """

    def __init__(self, cfg, seed=0):
        self.type = cfg["type"]
        self.static_friction = float(cfg.get("static_friction", 1.0))
        self.restitution = float(cfg.get("restitution", 0.0))
        if self.type == "plane":
            self.height_field = None
            return
        if self.type != "trimesh":
            raise ValueError(f"Invalid terrain type: {self.type}")

        rng = np.random.default_rng(seed)
        self.horizontal_scale = hs = cfg["horizontal_scale"]
        self.vertical_scale = vs = cfg["vertical_scale"]
        self.border_size = cfg["border_size"]
        self.env_width = cfg["num_terrains"] * cfg["terrain_width"]
        self.env_length = cfg["terrain_length"]
        self.border_pixels = bp = int(self.border_size / hs)
        wpx = int(cfg["terrain_width"] / hs)
        lpx = int(cfg["terrain_length"] / hs)
        raw = np.zeros((cfg["num_terrains"] * wpx + 2 * bp, lpx + 2 * bp), dtype=np.float64)

        props = np.asarray(cfg["terrain_proportions"], dtype=np.float64)
        cum = cfg["num_terrains"] * np.cumsum(props) / props.sum()
        for i in range(cfg["num_terrains"]):
            tile = np.zeros((wpx, lpx))
            if i < cum[0]:
                pass
            elif i < cum[1]:
                _pyramid_sloped(tile, cfg["slope"], hs, vs)
            elif i < cum[2]:
                _random_uniform(
                    tile, rng, -0.5 * cfg["random_height"], 0.5 * cfg["random_height"],
                    0.005, 0.2, hs, vs,
                )
            else:
                _discrete_obstacles(
                    tile, rng, cfg["discrete_height"], 1.0, 2.0, 20, hs, vs,
                )
            raw[bp + i * wpx: bp + (i + 1) * wpx, bp: bp + lpx] = tile

        # store in meters, f32, on device
        self.height_field = jnp.asarray(raw * vs, dtype=jnp.float32)

    def heights(self, xy, hf=None):
        """Bilinear terrain height at world xy [..., 2] -> [...].

        Cost model (profiler-verified on v5e): XLA's TPU gather runs at
        ~10 ns/element regardless of formulation — 4 corners x 8192 envs x
        72 points = 24 ms.  Hot paths with many points should use the
        Pallas sampling kernel (terrain/sample_kernel.py) instead; this
        path is for small query sets (roots, resets) and CPU.  Pass the
        heightfield via `hf` so it enters jitted programs as an operand."""
        if self.height_field is None:
            return jnp.zeros(xy.shape[:-1], dtype=jnp.float32)
        hf = self.height_field if hf is None else hf
        x = self.border_pixels + xy[..., 0] / self.horizontal_scale
        y = self.border_pixels + xy[..., 1] / self.horizontal_scale
        x = jnp.clip(x, 0.0, hf.shape[0] - 1.001)
        y = jnp.clip(y, 0.0, hf.shape[1] - 1.001)
        x1 = jnp.floor(x).astype(jnp.int32)
        y1 = jnp.floor(y).astype(jnp.int32)
        fx, fy = x - x1, y - y1
        h11 = hf[x1, y1]
        h21 = hf[x1 + 1, y1]
        h12 = hf[x1, y1 + 1]
        h22 = hf[x1 + 1, y1 + 1]
        return (
            (1 - fx) * (1 - fy) * h11 + fx * (1 - fy) * h21
            + (1 - fx) * fy * h12 + fx * fy * h22
        )

    def heights_and_normals(self, xy, hf=None):
        """Fused single-pass bilinear height + surface normal (shares the
        4 corner gathers; see heights() for the gather cost model)."""
        if self.height_field is None:
            h = jnp.zeros(xy.shape[:-1], dtype=jnp.float32)
            n = jnp.zeros(xy.shape[:-1] + (3,), dtype=jnp.float32)
            return h, n.at[..., 2].set(1.0)
        hf = self.height_field if hf is None else hf
        x = self.border_pixels + xy[..., 0] / self.horizontal_scale
        y = self.border_pixels + xy[..., 1] / self.horizontal_scale
        x = jnp.clip(x, 0.0, hf.shape[0] - 1.001)
        y = jnp.clip(y, 0.0, hf.shape[1] - 1.001)
        x1 = jnp.floor(x).astype(jnp.int32)
        y1 = jnp.floor(y).astype(jnp.int32)
        fx, fy = x - x1, y - y1
        h11 = hf[x1, y1]
        h21 = hf[x1 + 1, y1]
        h12 = hf[x1, y1 + 1]
        h22 = hf[x1 + 1, y1 + 1]
        h = ((1 - fx) * (1 - fy) * h11 + fx * (1 - fy) * h21
             + (1 - fx) * fy * h12 + fx * fy * h22)
        dhdx = ((1 - fy) * (h21 - h11) + fy * (h22 - h12)) / self.horizontal_scale
        dhdy = ((1 - fx) * (h12 - h11) + fx * (h22 - h21)) / self.horizontal_scale
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        return h, n / jnp.linalg.norm(n, axis=-1, keepdims=True)

    def normals(self, xy, hf=None):
        """Surface normal of the bilinear patch at world xy [..., 2] -> [..., 3]."""
        if self.height_field is None:
            n = jnp.zeros(xy.shape[:-1] + (3,), dtype=jnp.float32)
            return n.at[..., 2].set(1.0)
        hf = self.height_field if hf is None else hf
        x = self.border_pixels + xy[..., 0] / self.horizontal_scale
        y = self.border_pixels + xy[..., 1] / self.horizontal_scale
        x = jnp.clip(x, 0.0, hf.shape[0] - 1.001)
        y = jnp.clip(y, 0.0, hf.shape[1] - 1.001)
        x1 = jnp.floor(x).astype(jnp.int32)
        y1 = jnp.floor(y).astype(jnp.int32)
        fx, fy = x - x1, y - y1
        h11 = hf[x1, y1]
        h21 = hf[x1 + 1, y1]
        h12 = hf[x1, y1 + 1]
        h22 = hf[x1 + 1, y1 + 1]
        dhdx = ((1 - fy) * (h21 - h11) + fy * (h22 - h12)) / self.horizontal_scale
        dhdy = ((1 - fx) * (h12 - h11) + fx * (h22 - h21)) / self.horizontal_scale
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
