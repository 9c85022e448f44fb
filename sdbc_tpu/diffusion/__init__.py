from sdbc_tpu.diffusion.schedulers import (
    ScheduleConfig, make_schedule, ddpm_add_noise, ddpm_step,
    ddim_timesteps, ddim_step, pndm_timesteps, pndm_init_state, pndm_step,
    dpm_timesteps, dpm_init_state, dpm_step,
)

__all__ = [
    "ScheduleConfig", "make_schedule", "ddpm_add_noise", "ddpm_step",
    "ddim_timesteps", "ddim_step", "pndm_timesteps", "pndm_init_state",
    "pndm_step", "dpm_timesteps", "dpm_init_state", "dpm_step",
]
