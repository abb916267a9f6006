from .ising import (
    IsingProblem,
    ising_integrand,
    make_ising,
    make_ising_dd,
    make_ising_mp,
    make_ising_qd,
)
from .mvn import MvnDensity, MvnProblem, make_mvn, make_mvn_density, make_mvn_family
from .stdnorm import StdnormProblem, make_stdnorm, make_stdnorm_dd, make_stdnorm_qd
from .cos import CosCoefficients, cos_approximate, gaussian_chf, make_cos_coefficients, s_vectors
from .chf import basket_chf, basket_pdf
from .quantics import QuanticsProblem, make_quantics, quantics_cross
from .truths import CHF_REFERENCE, CHF_RHO05, ising_truth

__all__ = [
    "IsingProblem", "ising_integrand", "make_ising",
    "make_ising_dd", "make_ising_qd", "make_ising_mp",
    "MvnDensity", "MvnProblem", "make_mvn", "make_mvn_density", "make_mvn_family",
    "StdnormProblem", "make_stdnorm", "make_stdnorm_dd", "make_stdnorm_qd",
    "CosCoefficients", "cos_approximate", "gaussian_chf", "make_cos_coefficients", "s_vectors",
    "QuanticsProblem", "make_quantics", "quantics_cross",
    "CHF_REFERENCE", "CHF_RHO05", "ising_truth",
]
