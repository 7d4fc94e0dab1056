"""Numerics toolkit and configuration."""
