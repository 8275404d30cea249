"""Numeric ops layer: pure jnp functions shared by both pipeline stages."""
