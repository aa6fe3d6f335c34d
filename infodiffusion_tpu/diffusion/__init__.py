from infodiffusion_tpu.diffusion.schedule import (
    Schedule,
    make_schedule,
    q_sample,
    ddpm_step,
    ddim_step,
    ddim_reverse_step,
    predict_x0_from_eps,
    strided_ddim_step,
)
from infodiffusion_tpu.diffusion.samplers import (
    DiffusionProcess,
    LatentDiffusionProcess,
    TwoPhaseDiffusionProcess,
    reverse_sample_loop,
    sample_loop,
    strided_ddim_loop,
    two_phase_sample_loop,
)

__all__ = [
    "Schedule",
    "make_schedule",
    "q_sample",
    "ddpm_step",
    "ddim_step",
    "ddim_reverse_step",
    "predict_x0_from_eps",
    "strided_ddim_step",
    "DiffusionProcess",
    "TwoPhaseDiffusionProcess",
    "LatentDiffusionProcess",
    "sample_loop",
    "reverse_sample_loop",
    "two_phase_sample_loop",
    "strided_ddim_loop",
]
