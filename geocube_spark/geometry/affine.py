"""Affine grid transform, matching the rasterio/odc convention.

world_x = c + a*col + b*row
world_y = f + d*col + e*row

The reference derives cell-center coordinates from this transform via
``rioxarray.affine_to_coords`` (reference geocube/vector_to_cube.py:107-111):
x[i] = c + a*(i+0.5), y[j] = f + e*(j+0.5) for axis-aligned grids.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Affine:
    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @staticmethod
    def identity() -> "Affine":
        return Affine(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @staticmethod
    def translation(tx: float, ty: float) -> "Affine":
        return Affine(1.0, 0.0, tx, 0.0, 1.0, ty)

    @staticmethod
    def scale(sx: float, sy: float) -> "Affine":
        return Affine(sx, 0.0, 0.0, 0.0, sy, 0.0)

    def __mul__(self, other: "Affine") -> "Affine":
        # matrix product self @ other (row-major 2x3 with implicit [0,0,1])
        a1, b1, c1, d1, e1, f1 = self.a, self.b, self.c, self.d, self.e, self.f
        a2, b2, c2, d2, e2, f2 = (
            other.a,
            other.b,
            other.c,
            other.d,
            other.e,
            other.f,
        )
        return Affine(
            a1 * a2 + b1 * d2,
            a1 * b2 + b1 * e2,
            a1 * c2 + b1 * f2 + c1,
            d1 * a2 + e1 * d2,
            d1 * b2 + e1 * e2,
            d1 * c2 + e1 * f2 + f1,
        )

    def invert(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        if det == 0:
            raise ValueError("degenerate affine")
        ia = self.e / det
        ib = -self.b / det
        id_ = -self.d / det
        ie = self.a / det
        ic = -(ia * self.c + ib * self.f)
        if_ = -(id_ * self.c + ie * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    # world <-> pixel; accepts scalars or numpy arrays
    def xy(self, col, row):
        return (
            self.c + self.a * col + self.b * row,
            self.f + self.d * col + self.e * row,
        )

    def rowcol_f(self, x, y):
        """Fractional (col, row) pixel coordinates of world (x, y)."""
        inv = self.invert()
        return (
            inv.c + inv.a * x + inv.b * y,
            inv.f + inv.d * x + inv.e * y,
        )

    def to_gdal(self):
        return (self.c, self.a, self.b, self.f, self.d, self.e)

    def tolist(self):
        return [self.a, self.b, self.c, self.d, self.e, self.f]


def affine_to_coords(affine: Affine, width: int, height: int):
    """Cell-center coordinate vectors, reference vector_to_cube.py:107-111."""
    cols = np.arange(width, dtype=np.float64) + 0.5
    rows = np.arange(height, dtype=np.float64) + 0.5
    x = affine.c + affine.a * cols + affine.b * 0.5
    y = affine.f + affine.e * rows + affine.d * 0.5
    return {"x": x, "y": y}
