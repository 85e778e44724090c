"""Index read/write layer (reference: core/index/)."""
