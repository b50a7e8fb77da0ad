"""GEDCOM frontend — populated in M2."""
