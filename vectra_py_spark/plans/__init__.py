"""Composed query plans: the driver-contract registry and flagship plans."""
