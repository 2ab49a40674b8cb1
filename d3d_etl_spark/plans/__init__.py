"""Physical-plan inspection utilities — the scale doctrine, enforced."""
