"""Events window ops (filled in below)."""
