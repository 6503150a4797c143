"""ML stages: flight-phase K-Means + anomaly scoring (SURVEY.md §2.9)."""
