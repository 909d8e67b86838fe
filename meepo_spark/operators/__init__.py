"""Reusable engine operators that Spark lacks as built-ins — each a
composition of DataFrame ops (never a row-at-a-time UDF), per the
preference order in SURVEY.md §4.3."""
