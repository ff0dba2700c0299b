"""Host-side utilities: IO, stage tracking, config."""
