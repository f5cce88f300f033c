"""GAN training engine: jitted steps, schedules, checkpoints."""
