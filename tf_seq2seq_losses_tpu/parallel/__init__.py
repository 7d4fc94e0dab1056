"""Device-mesh sharding and data-parallel training utilities."""
