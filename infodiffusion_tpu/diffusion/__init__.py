from infodiffusion_tpu.diffusion.schedule import (
    Schedule,
    make_schedule,
    q_sample,
    ddpm_step,
    ddim_step,
    ddim_reverse_step,
    predict_x0_from_eps,
)

__all__ = [
    "Schedule",
    "make_schedule",
    "q_sample",
    "ddpm_step",
    "ddim_step",
    "ddim_reverse_step",
    "predict_x0_from_eps",
]
