"""Sources: resource providers and format readers."""
