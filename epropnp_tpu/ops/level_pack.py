"""Pack an FPN pyramid into one composite map for MXU-friendly convs.

Motivation (measured, STATUS round-4): the FCOS towers run shared-weight
convs over 5 pyramid levels; at 672x1600 serving the three coarsest maps
are 21x50 and below — far too small to tile the 128x128 MXU — and the
tower stage sits at 9.7% MFU. Packing the levels into ONE canvas runs
each conv once at a shape the MXU can tile.

Exactness rules (pinned by tests/test_level_pack.py):

* Levels are separated by a ``gap`` of >= 2 zero pixels and the layout
  leaves >= 1 zero at the canvas edge wherever a level touches it via
  its gap. A 3x3 conv then sees exactly the zeros per-level 'same'
  padding would provide — PROVIDED the caller re-zeroes the gaps after
  every conv (``comp * layout.mask``), because the conv writes nonzero
  garbage one pixel into each gap.
* GroupNorm statistics are per level: apply the shared GN module to each
  level's static slice (``map_levels``) — identical numerics to the
  per-level path.
* Deformable convs must NOT sample across level borders; DeformConv
  takes the layout and samples each level's region from that level's own
  patch table with level-local clamping (ops/deform_conv.py).

The reference has no equivalent (its GPU towers loop levels,
EPro-PnP-Det/epropnp_det/models/dense_heads/fcos_emb_head.py:165-198 via
mmdet multi_apply); this is a TPU-specific restructuring with identical
outputs.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class LevelLayout:
    """Static placement of pyramid levels on one canvas.

    Attributes:
        shapes: per-level (h, w).
        origins: per-level (y, x) canvas offsets.
        canvas_hw: (H, W) canvas shape.
        gap: zero-pixel separation between regions.
    """

    def __init__(self, shapes, origins, canvas_hw, gap):
        self.shapes = [tuple(s) for s in shapes]
        self.origins = [tuple(o) for o in origins]
        self.canvas_hw = tuple(canvas_hw)
        self.gap = gap
        self._mask = None

    @property
    def mask(self) -> jnp.ndarray:
        """(H, W, 1) float32 canvas mask: 1 inside level regions."""
        if self._mask is None:
            m = np.zeros(self.canvas_hw + (1,), np.float32)
            for (h, w), (y, x) in zip(self.shapes, self.origins):
                m[y:y + h, x:x + w] = 1.0
            self._mask = jnp.asarray(m)
        return self._mask

    def waste(self) -> float:
        """Fraction of canvas pixels outside any level region."""
        used = sum(h * w for h, w in self.shapes)
        total = self.canvas_hw[0] * self.canvas_hw[1]
        return 1.0 - used / total


def plan_level_packing(shapes: Sequence[Tuple[int, int]],
                       gap: int = 2) -> LevelLayout:
    """Shelf-pack pyramid levels (descending size) onto one canvas.

    Level 0 anchors the canvas width; subsequent levels fill left-to-
    right shelves below it, wrapping when a row would overflow. For FPN
    halving pyramids the result is ~(1.5 h0, w0) with <20% waste.
    """
    if not shapes:
        raise ValueError('no level shapes')
    h0, w0 = shapes[0]
    width = w0
    origins = [(0, 0)]
    shelf_y = h0 + gap
    shelf_h = 0
    cur_x = 0
    for h, w in shapes[1:]:
        if cur_x and cur_x + w > width:
            shelf_y += shelf_h + gap
            shelf_h = 0
            cur_x = 0
        if w > width:  # pathological (non-descending) input
            width = w
        origins.append((shelf_y, cur_x))
        cur_x += w + gap
        shelf_h = max(shelf_h, h)
    canvas = (shelf_y + shelf_h, width)
    return LevelLayout(shapes, origins, canvas, gap)


def pack_levels(feats: Sequence[jnp.ndarray],
                layout: LevelLayout) -> jnp.ndarray:
    """Per-level (n, h, w, c) maps -> (n, H, W, c) composite (gaps zero)."""
    n, _, _, c = feats[0].shape
    comp = jnp.zeros((n,) + layout.canvas_hw + (c,), feats[0].dtype)
    for f, (h, w), (y, x) in zip(feats, layout.shapes, layout.origins):
        comp = comp.at[:, y:y + h, x:x + w, :].set(f.astype(comp.dtype))
    return comp


def unpack_levels(comp: jnp.ndarray, layout: LevelLayout
                  ) -> List[jnp.ndarray]:
    """(n, H, W, c) composite -> per-level (n, h, w, c) maps."""
    return [comp[:, y:y + h, x:x + w, :]
            for (h, w), (y, x) in zip(layout.shapes, layout.origins)]


def map_levels(comp: jnp.ndarray, layout: LevelLayout, fn) -> jnp.ndarray:
    """Apply ``fn`` to each level's slice and write it back.

    For ops whose statistics must stay per-level (GroupNorm). ``fn`` may
    change the channel count (all levels must agree).
    """
    outs = [fn(comp[:, y:y + h, x:x + w, :])
            for (h, w), (y, x) in zip(layout.shapes, layout.origins)]
    n = comp.shape[0]
    out = jnp.zeros((n,) + layout.canvas_hw + (outs[0].shape[-1],),
                    outs[0].dtype)
    for o, (h, w), (y, x) in zip(outs, layout.shapes, layout.origins):
        out = out.at[:, y:y + h, x:x + w, :].set(o)
    return out


def rezero_gaps(comp: jnp.ndarray, layout: LevelLayout) -> jnp.ndarray:
    """Zero everything outside level regions (call after every conv)."""
    return comp * layout.mask.astype(comp.dtype)
