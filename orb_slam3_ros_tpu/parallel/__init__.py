"""Multi-chip scale-out: mesh construction + distributed BA shardings."""
