"""Cross-cutting utilities: logger, flags, factories, seeding."""
