"""Scene/state engine: the Generator API and its jitted render programs."""
