"""Expression-level helpers shared by operators and oracle SQL."""
