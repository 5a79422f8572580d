"""Sources: synthetic web-page generation and table IO helpers."""
