"""Alignment: in-graph MAS, beta-binomial prior."""
from .mas import mas, mas_durations
from .prior import BetaBinomialInterpolator, beta_binomial_prior

__all__ = ["mas", "mas_durations", "BetaBinomialInterpolator",
           "beta_binomial_prior"]
