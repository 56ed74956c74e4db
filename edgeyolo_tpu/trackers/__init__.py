"""trackers subpackage."""
