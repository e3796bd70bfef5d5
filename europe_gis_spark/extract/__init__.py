"""Deterministic web-page extraction (text, coordinates, hostname)."""
