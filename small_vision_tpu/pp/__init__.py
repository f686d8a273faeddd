"""String-minilanguage preprocessing with host and device stages."""
