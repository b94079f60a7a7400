"""Host-side utilities: synthetic data, trajectory IO, evaluation, config."""
