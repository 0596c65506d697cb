"""transform filter (reference: python/cwipc/filters/transform.py).

Semantics: p' = (p + offset) * scale, vectorized instead of the
reference's per-point loop.
"""

import numpy as np

from .abstract import BaseFilter


class TransformFilter(BaseFilter):
    """
    transform - Translate-then-scale all points: p' = (p + (x,y,z)) * scale.
        Arguments:
            x, y, z: translation
            scale: scale factor applied after translation
    """

    filtername = "transform"

    def __init__(self, x: float, y: float, z: float, scale: float):
        super().__init__()
        self.offset = np.array([x, y, z], np.float32)
        self.scale = scale

    def _process(self, pc):
        from .. import cwipc_from_numpy_matrix

        m = pc.get_numpy_matrix()
        m[:, 0:3] = (m[:, 0:3] + self.offset) * self.scale
        new_pc = cwipc_from_numpy_matrix(m, pc.timestamp())
        new_pc._set_cellsize(pc.cellsize())
        return new_pc


CustomFilter = TransformFilter
