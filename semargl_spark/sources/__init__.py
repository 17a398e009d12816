"""Sources: deterministic synthetic transcript generation and readers."""
