"""Reusable DataFrame -> DataFrame operators (the engine's operator library)."""
