"""Declared queries — placeholder, populated in this round."""
