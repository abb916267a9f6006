from .quadrature import gauss_legendre, lgwt, map_to_interval, quad_rinv, quad_rinv_error
from .sampling import weighted_lottery

__all__ = ["gauss_legendre", "lgwt", "map_to_interval", "quad_rinv",
           "quad_rinv_error", "weighted_lottery"]
