"""Reference ellipsoid parameters.

Published geodetic constants (GRS80: Moritz 2000; WGS84: NIMA TR8350.2).
Parity reference: /root/reference/dynadjust/include/parameters/
dnadatumprojectionparam.hpp:38-50 and dnaellipsoid.cpp (derived quantities).
"""

from dataclasses import dataclass, field
import math


@dataclass(frozen=True)
class Ellipsoid:
    a: float            # semi-major axis (m)
    inv_f: float        # inverse flattening

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def b(self) -> float:
        return self.a - (self.a / self.inv_f)

    @property
    def e1sq(self) -> float:
        # first eccentricity squared: (a^2 - b^2) / a^2
        b = self.b
        return (self.a * self.a - b * b) / (self.a * self.a)

    @property
    def e2sq(self) -> float:
        # second eccentricity squared: (a^2 - b^2) / b^2
        b = self.b
        return (self.a * self.a - b * b) / (b * b)

    @property
    def e2(self) -> float:
        return math.sqrt(self.e2sq)


GRS80 = Ellipsoid(a=6378137.0, inv_f=298.257222101)
WGS84 = Ellipsoid(a=6378137.0, inv_f=298.25722360)
ANS = Ellipsoid(a=6378160.0, inv_f=298.25)
INTERNATIONAL1924 = Ellipsoid(a=6378388.0, inv_f=297.0)

_DATUM_ELLIPSOIDS = {
    # Australian datums and all ITRF realisations use GRS80 in the reference
    # (CDnaEllipsoid defaults to GRS80; dnaellipsoid.cpp:33-36)
    "GDA2020": GRS80,
    "GDA94": GRS80,
    "WGS84": WGS84,
    "AGD66": ANS,
    "AGD84": ANS,
}


def ellipsoid_for_datum(name: str) -> Ellipsoid:
    key = name.upper().replace(" ", "")
    if key.startswith("ITRF") or key.startswith("NAD83") \
            or key.startswith("SIRGAS"):
        # SIRGAS intentionally GRS80: "epsg.org has incorrectly assigned
        # WGS 84 ellipsoid to SIRGAS ROU98" (dnaepsg.hpp spheroid table)
        return GRS80
    if key.startswith("YACARE"):
        return INTERNATIONAL1924
    if key.startswith("WGS84"):
        return WGS84
    return _DATUM_ELLIPSOIDS.get(key, GRS80)
