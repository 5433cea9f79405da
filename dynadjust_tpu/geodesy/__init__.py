from .conversions import (
    geo_to_cart, cart_to_geo, dms_to_deg, deg_to_dms, dms_to_rad, rad_to_dms,
    prime_vertical, prime_meridian,
)
from .local_frame import (
    rotation_cart_to_local, rotate_cart_local, rotate_local_cart,
    propagate_variance_local_cart, propagate_variance_cart_local,
)
