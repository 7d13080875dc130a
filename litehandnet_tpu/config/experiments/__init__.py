"""Generated experiment configs (see config/templates.py)."""
