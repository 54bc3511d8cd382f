"""UCUM unit-of-measure length conversion (GmlUtils.lengthInMeters, G-10).

GmlUtils.java:220-240: m=1, km=1000, M / NM / [nmi_i]=1852, mi / [mi_i]=1609.34;
a URI with a fragment ('...#m') uses the fragment as the symbol.
"""

from __future__ import annotations

_FACTORS = {
    "m": 1.0,
    "km": 1000.0,
    "M": 1852.0,
    "NM": 1852.0,
    "[nmi_i]": 1852.0,
    "mi": 1609.34,
    "[mi_i]": 1609.34,
}


def length_in_meters(value: float, uom: str) -> float:
    """Convert a uom-tagged length to meters; unknown symbols raise
    (reference throws RuntimeException for unrecognized uom)."""
    symbol = uom.strip()
    if "#" in symbol:  # URI form, e.g. http://.../uom#m (GmlUtils.java:222)
        symbol = symbol.rsplit("#", 1)[-1]
    try:
        return float(value) * _FACTORS[symbol]
    except KeyError:
        raise ValueError(f"Unrecognized unit of measure: {uom}") from None
