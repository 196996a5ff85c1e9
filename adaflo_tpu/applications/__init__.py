"""Application drivers (counterpart of the reference's applications/)."""
