"""solutions subpackage."""
