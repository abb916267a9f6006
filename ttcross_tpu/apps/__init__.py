from .ising import IsingProblem, ising_integrand, make_ising
from .mvn import MvnDensity, MvnProblem, make_mvn, make_mvn_density
from .stdnorm import StdnormProblem, make_stdnorm
from .cos import CosCoefficients, cos_approximate, gaussian_chf, make_cos_coefficients, s_vectors
from .chf import basket_chf, basket_pdf
from .quantics import QuanticsProblem, make_quantics, quantics_cross
from .truths import CHF_REFERENCE, CHF_RHO05, ising_truth

__all__ = [
    "IsingProblem", "ising_integrand", "make_ising",
    "MvnDensity", "MvnProblem", "make_mvn", "make_mvn_density",
    "StdnormProblem", "make_stdnorm",
    "CosCoefficients", "cos_approximate", "gaussian_chf", "make_cos_coefficients", "s_vectors",
    "QuanticsProblem", "make_quantics", "quantics_cross",
    "CHF_REFERENCE", "CHF_RHO05", "ising_truth",
]
