from toycrystals_tpu.models.vae import CondVAE, VAE, kl_stats
from toycrystals_tpu.models.diffusion_prior import (
    DiffusionPrior,
    DiffusionPriorFiLM,
    DiffusionSchedule,
    timestep_embedding_discrete,
)
from toycrystals_tpu.models.flow_matching import sample_rectified_flow, shift_t
from toycrystals_tpu.models.moe_prior import DiffusionPriorMoE, MoEFiLMResBlock
from toycrystals_tpu.models.sde_score_model import (
    CondUNetTiny,
    ConditionEmbedding,
    VPSDE,
    timestep_embedding_continuous,
    diffusion_loss_eps,
    eps_apply_from_v,
    predict_eps_cfg,
    auto_chunk,
    sample_chunked,
    sample_ddim,
    sample_dpmpp_2m,
    sample_inpaint_reverse_sde,
    sample_probability_flow_ode,
    sample_reverse_sde_euler_maruyama,
)

__all__ = [
    "CondVAE",
    "VAE",
    "kl_stats",
    "DiffusionPrior",
    "DiffusionPriorFiLM",
    "DiffusionPriorMoE",
    "MoEFiLMResBlock",
    "DiffusionSchedule",
    "timestep_embedding_discrete",
    "CondUNetTiny",
    "ConditionEmbedding",
    "VPSDE",
    "timestep_embedding_continuous",
    "diffusion_loss_eps",
    "eps_apply_from_v",
    "predict_eps_cfg",
    "auto_chunk",
    "sample_chunked",
    "sample_ddim",
    "sample_dpmpp_2m",
    "sample_inpaint_reverse_sde",
    "sample_probability_flow_ode",
    "sample_rectified_flow",
    "sample_reverse_sde_euler_maruyama",
    "shift_t",
]
