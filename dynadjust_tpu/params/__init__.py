from .ellipsoids import Ellipsoid, GRS80, WGS84, ANS, INTERNATIONAL1924, ellipsoid_for_datum
from .datums import Datum, datum_from_name, is_dynamic_frame, decimal_year, parse_epoch
