"""Host-side utilities: datasets, meshing, checkpointing, visualization."""
