from .film import fused_film
from .sampler_step import fused_p_sample_step
from .groupnorm import fused_groupnorm_act

__all__ = ["fused_film", "fused_p_sample_step", "fused_groupnorm_act"]
