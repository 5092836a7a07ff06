"""Read-side query surface (the engine's SELECT layer)."""
