"""24-point star-convex polygon geometry.

Parity targets:
* ``pts_in_poly`` — the angle-sum point-in-polygon test the 24p SimOTA uses
  to pick candidate anchors (`/root/reference/yolox_24p/models/losses.py:555-592`).
  The reference loops over GTs in Python and hardcodes ``device='cuda:0'``;
  here the whole [G, A] test is one vectorized atan2 pipeline, vmap-able and
  fused by XLA (reduction over the 24 vertices happens in-register).
* ``radii_from_points`` — GT label rows [cls, cx, cy, 24×(x,y)] → 24 radii
  (`losses.py:97-108`; ray order: start at +x axis, 15° steps).
* ``polygon_points_from_radii`` — decode radii back to xy points.  The
  reference's NMS path multiplies each direction by its angle
  (``θ·cosθ``, `yolox_24p/utils/boxes.py:32-33`) which collapses ray 0 and
  distorts the NMS rectangles; ``reference_parity=True`` reproduces that,
  the default uses the correct ``cosθ`` (the reference's own drawing path,
  `show_24p.py:346-353`, uses the correct math too).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_POINTS = 24
STEP_RAD = 15.0 * np.pi / 180.0
# Ray angles: start at +x axis, 15° increments (24 rays).
ANGLES = np.arange(N_POINTS, dtype=np.float32) * STEP_RAD
COS_ANGLES = np.cos(ANGLES).astype(np.float32)
SIN_ANGLES = np.sin(ANGLES).astype(np.float32)
# Reference-parity (buggy) direction tables: scaled by the angle itself.
COS_ANGLES_PARITY = (ANGLES * np.cos(ANGLES)).astype(np.float32)
SIN_ANGLES_PARITY = (ANGLES * np.sin(ANGLES)).astype(np.float32)


def radii_from_points(labels_xy):
    """[..., 50] rows (cx, cy, 24×(x, y)) -> radii [..., 24]."""
    center = labels_xy[..., 0:2]
    px = labels_xy[..., 2::2]
    py = labels_xy[..., 3::2]
    dx = px - center[..., 0:1]
    dy = py - center[..., 1:2]
    return jnp.sqrt(dx * dx + dy * dy)


def polygon_points_from_radii(centers, radii, reference_parity: bool = False):
    """Decode (centers [..., 2], radii [..., 24]) -> xy points [..., 24, 2]."""
    if reference_parity:
        cos_t, sin_t = COS_ANGLES_PARITY, SIN_ANGLES_PARITY
    else:
        cos_t, sin_t = COS_ANGLES, SIN_ANGLES
    x = centers[..., 0:1] + radii * cos_t
    y = centers[..., 1:2] + radii * sin_t
    return jnp.stack([x, y], axis=-1)


def pts_in_poly(poly_x, poly_y, pts_x, pts_y, degree_threshold: float = 350.0):
    """Angle-sum point-in-polygon, fully vectorized.

    A point is inside when the absolute turning angles to consecutive vertex
    pairs sum to (almost) 360° (ref threshold ≥350°, `losses.py:586-588`).

    Args:
      poly_x, poly_y: [G, 24] polygon vertices.
      pts_x, pts_y: [A] query points.
    Returns:
      [G, A] bool.
    """
    # [G, 24, A] vectors vertex -> point
    vsx = poly_x[:, :, None] - pts_x[None, None, :]
    vsy = poly_y[:, :, None] - pts_y[None, None, :]
    vex = jnp.roll(poly_x, -1, axis=1)[:, :, None] - pts_x[None, None, :]
    vey = jnp.roll(poly_y, -1, axis=1)[:, :, None] - pts_y[None, None, :]

    cross = vsx * vey - vex * vsy
    dot = vsx * vex + vsy * vey
    ang = jnp.arctan2(jnp.abs(cross), dot)  # [G, 24, A], in [0, π]
    total_deg = jnp.sum(ang, axis=1) * (180.0 / np.pi)
    return total_deg >= degree_threshold


def pts_in_poly_from_labels(labels_xy, pts_x, pts_y,
                            degree_threshold: float = 350.0):
    """Same test but straight from padded label rows [G, 50]."""
    return pts_in_poly(
        labels_xy[:, 2::2], labels_xy[:, 3::2], pts_x, pts_y, degree_threshold
    )
