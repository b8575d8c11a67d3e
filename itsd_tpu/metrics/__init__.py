from .frechet import (compute_fid, frechet_distance, frechet_distance_jax,
                      gaussian_stats)
from .is_score import (inception_score, inception_score_from_probs,
                       is_score_jax)

__all__ = ["compute_fid", "frechet_distance", "frechet_distance_jax",
           "gaussian_stats", "inception_score",
           "inception_score_from_probs", "is_score_jax"]
