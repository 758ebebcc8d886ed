"""Query operators beyond the reference's scan surface.

The reference implements only ingest + inclusive range scan
(SURVEY.md §2.1); everything here is the tier-2 surface (SURVEY.md §2.2,
§7.2): time-series windows, as-of join, dedup family, similarity search,
text analysis, multimodal plumbing.  All operators are DataFrame-level —
no custom Catalyst rules are needed (SURVEY.md §4.5).
"""
