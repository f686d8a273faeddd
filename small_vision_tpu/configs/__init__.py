"""Config system: typed arg-string minilanguage + the shipped config presets."""
