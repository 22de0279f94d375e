"""Plan inspection / assertion utilities."""
