"""encoders subpackage."""
