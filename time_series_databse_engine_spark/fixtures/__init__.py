"""Committed model fixtures — small trained artifacts (a PCA basis)
whose training step is not SQL-expressible but whose APPLICATION is
plain column arithmetic, pinned as exact-repr literals so oracle-backed
entries can hash-match the applied math."""
