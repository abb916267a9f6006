from .quadrature import gauss_legendre, lgwt, map_to_interval, quad_rinv, quad_rinv_error

__all__ = ["gauss_legendre", "lgwt", "map_to_interval", "quad_rinv", "quad_rinv_error"]
