"""Training: losses, schedules, jitted steps, loops, eval probes."""
