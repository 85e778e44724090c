"""Foundation utilities (reference: core/utils/)."""
