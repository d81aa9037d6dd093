"""Base-32 geohash encode/decode, batched numpy.

Reimplements the bit math of GeoMesa's geohash utility (public tree:
geomesa-utils/.../geohash/GeoHash.scala — pure bit interleaving + base32;
mount empty at survey time, SURVEY.md §0).  Geohash interleaves LON first
(even bit positions counting from the top), unlike our cell ids which put
x in the low even bits — both are quadtrees, different digit order.
"""

from __future__ import annotations

import numpy as np

_B32 = np.array(list("0123456789bcdefghjkmnpqrstuvwxyz"))
_B32_INV = {c: i for i, c in enumerate("0123456789bcdefghjkmnpqrstuvwxyz")}


def encode(lon: np.ndarray, lat: np.ndarray, precision: int = 9) -> np.ndarray:
    """lon/lat arrays → geohash strings of ``precision`` chars (object
    array); NaN → None."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    nbits = precision * 5
    nlon = (nbits + 1) // 2  # lon gets the extra bit (even positions)
    nlat = nbits // 2
    with np.errstate(invalid="ignore"):
        xi = np.floor((lon + 180.0) / 360.0 * (1 << nlon))
        yi = np.floor((lat + 90.0) / 180.0 * (1 << nlat))
    bad = ~(np.isfinite(lon) & np.isfinite(lat))
    xi = np.clip(np.where(bad, 0, xi), 0, (1 << nlon) - 1).astype(np.uint64)
    yi = np.clip(np.where(bad, 0, yi), 0, (1 << nlat) - 1).astype(np.uint64)
    # interleave: bit j of the hash (MSB first) comes from lon if j even
    bits = np.zeros((len(xi), nbits), dtype=np.uint8)
    for j in range(nbits):
        if j % 2 == 0:  # lon bit, from MSB
            shift = nlon - 1 - (j // 2)
            bits[:, j] = (xi >> np.uint64(shift)) & np.uint64(1)
        else:
            shift = nlat - 1 - (j // 2)
            bits[:, j] = (yi >> np.uint64(shift)) & np.uint64(1)
    out = np.empty(len(xi), dtype=object)
    chars = np.empty((len(xi), precision), dtype="<U1")
    for c in range(precision):
        val = np.zeros(len(xi), dtype=np.int64)
        for b in range(5):
            val = (val << 1) | bits[:, c * 5 + b]
        chars[:, c] = _B32[val]
    for i in range(len(xi)):
        out[i] = None if bad[i] else "".join(chars[i])
    return out


def decode_bounds(gh: str) -> tuple[float, float, float, float]:
    """geohash → (lon0, lat0, lon1, lat1) cell bounds."""
    lon0, lon1 = -180.0, 180.0
    lat0, lat1 = -90.0, 90.0
    even = True
    for ch in gh.lower():
        val = _B32_INV[ch]
        for b in range(4, -1, -1):
            bit = (val >> b) & 1
            if even:
                mid = (lon0 + lon1) / 2
                lon0, lon1 = (mid, lon1) if bit else (lon0, mid)
            else:
                mid = (lat0 + lat1) / 2
                lat0, lat1 = (mid, lat1) if bit else (lat0, mid)
            even = not even
    return lon0, lat0, lon1, lat1


def decode_center(gh: str) -> tuple[float, float]:
    lon0, lat0, lon1, lat1 = decode_bounds(gh)
    return (lon0 + lon1) / 2, (lat0 + lat1) / 2
