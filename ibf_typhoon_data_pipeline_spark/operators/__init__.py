"""Relational operator library (SURVEY.md §2.2–2.8) as reusable,
composable DataFrame transforms. Each helper returns a lazy DataFrame
— actions stay at the sinks."""
