"""Geohash cell index (base32 bit-interleave) — pure JVM expressions.

Third cell-index family next to the packed quadkey (functions/tiles.py)
and the from-scratch S2 index (functions/s2.py): geohash is the one
external systems most often hand a pipeline (ES, Redis, GeoJSON tooling).
Encode is the classic alternating lon/lat bisection: quantize lon to
ceil(5p/2) bits and lat to floor(5p/2) bits, interleave MSB-first
starting with lon, emit 5-bit groups as base32 characters.

Everything is integer shift/mask plus ONE correctly-rounded double
multiply per axis, so the same expression shape produces identical
hashes in any engine — the DuckDB twin in __spark_entry__.py is built by
`geohash_sql()` from the same bit layout, and the pytest pins the
Wikipedia reference vector ("ezs42") plus encode/decode round-trips.

Scale posture: no UDF, no shuffle — a geohash column is whole-stage
codegen over the row's own lon/lat, exactly like the J5 point->cell
assignment it complements (cell prefix = spatial containment, so
`substr(geohash, 1, k)` GROUPs are the rollup hierarchy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["BASE32", "geohash_col", "geohash_sql", "decode_bounds"]

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _axis_bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    return (total + 1) // 2, total // 2  # lon bits, lat bits


def geohash_col(lon: Column, lat: Column, precision: int = 7) -> Column:
    """Geohash string of `precision` characters from lon/lat degrees."""
    xbits, ybits = _axis_bits(precision)
    x = F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * float(1 << xbits)), F.lit(0)),
        F.lit((1 << xbits) - 1),
    ).cast("long")
    y = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * float(1 << ybits)), F.lit(0)),
        F.lit((1 << ybits) - 1),
    ).cast("long")
    alphabet = F.array(*[F.lit(c) for c in BASE32])
    chars = []
    for k in range(precision):
        val: Column = F.lit(0).cast("long")
        for j in range(5):
            b = 5 * k + j  # bit position from the MSB of the interleave
            src, nb = (x, xbits - 1 - b // 2) if b % 2 == 0 else (y, ybits - 1 - b // 2)
            bit = F.shiftright(src, nb).bitwiseAND(F.lit(1))
            val = val * 2 + bit
        chars.append(F.element_at(alphabet, (val + 1).cast("int")))
    return F.concat(*chars)


def geohash_sql(lon: str, lat: str, precision: int = 7) -> str:
    """The identical bit layout as portable SQL (DuckDB twin builder)."""
    xbits, ybits = _axis_bits(precision)
    x = (
        f"CAST(least(greatest(floor((({lon}) + 180.0) / 360.0 * {float(1 << xbits)}), 0),"
        f" {(1 << xbits) - 1}) AS BIGINT)"
    )
    y = (
        f"CAST(least(greatest(floor((({lat}) + 90.0) / 180.0 * {float(1 << ybits)}), 0),"
        f" {(1 << ybits) - 1}) AS BIGINT)"
    )
    chars = []
    for k in range(precision):
        terms = []
        for j in range(5):
            b = 5 * k + j
            src, nb = (x, xbits - 1 - b // 2) if b % 2 == 0 else (y, ybits - 1 - b // 2)
            terms.append(f"((({src}) >> {nb}) & 1) * {1 << (4 - j)}")
        chars.append(f"substr('{BASE32}', CAST({' + '.join(terms)} AS INT) + 1, 1)")
    return " || ".join(chars)


def decode_bounds(geohash: str) -> tuple[float, float, float, float]:
    """Driver-side decode: (lon_lo, lat_lo, lon_hi, lat_hi) of the cell.

    The inverse used by tests and by callers materializing cell
    envelopes; the hot path never decodes (cells join on the string)."""
    x = y = 0
    xbits = ybits = 0
    for i, ch in enumerate(geohash):
        v = BASE32.index(ch)
        for j in range(5):
            bit = (v >> (4 - j)) & 1
            if (5 * i + j) % 2 == 0:
                x = (x << 1) | bit
                xbits += 1
            else:
                y = (y << 1) | bit
                ybits += 1
    lon_lo = x / (1 << xbits) * 360.0 - 180.0
    lat_lo = y / (1 << ybits) * 180.0 - 90.0
    return (
        lon_lo,
        lat_lo,
        lon_lo + 360.0 / (1 << xbits),
        lat_lo + 180.0 / (1 << ybits),
    )
