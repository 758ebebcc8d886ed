"""Sequence packing for LLM training pipelines.

Packs variable-length documents into fixed-token-budget bins (the
"sample packing" step before batching) with first-fit-decreasing — a
greedy 11/9-OPT bin packing.  Global optimal packing needs total order;
instead docs are hash-partitioned into ``num_groups`` independent packing
groups and packed per group with ``applyInPandas``.  At 100 TB each group
packs independently on one worker from a narrow (id, n_tokens) projection
— no text bytes move, and waste stays within a fraction of a percent of
global FFD once groups hold thousands of docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PACK_SCHEMA = (
    "pack_group int, doc_id long, n_tokens long, bin_id long, bin_fill long"
)


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    num_groups: int = 16,
    group_hash: str = "xxhash64",
) -> DataFrame:
    """Assign each doc a ``(pack_group, bin_id)`` such that each bin's token
    total is ≤ ``max_tokens`` (docs longer than the budget get a bin of
    their own — the caller truncates).  Deterministic: groups come from a
    hash of the id, packing order is (tokens desc, id).

    ``group_hash``: ``"xxhash64"`` (production — cheapest) or ``"md5"``
    (first-hex-digit mod groups — reproducible in ANSI SQL, which lets the
    whole greedy packing hash-compare against a recursive-CTE oracle that
    replays first-fit step by step).
    """
    import pandas as pd

    if token_col is None:
        tokens = F.size(F.split(F.col(text_col), "\\s+"))
    else:
        tokens = F.col(token_col)
    if group_hash == "md5":
        grp = F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 1), 16, 10)
            .cast("int"),
            F.lit(num_groups),
        )
    else:
        grp = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(num_groups))
    narrow = df.select(
        grp.cast("int").alias("pack_group"),
        F.col(id_col).cast("long").alias("doc_id"),
        tokens.cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        fills: list[int] = []  # bin_id -> current fill
        bin_ids = []
        for t in pdf["n_tokens"]:
            placed = None
            for b, fill in enumerate(fills):  # first fit
                if fill + t <= max_tokens:
                    placed = b
                    fills[b] = fill + t
                    break
            if placed is None:
                placed = len(fills)
                fills.append(int(t))
            bin_ids.append(placed)
        pdf = pdf.assign(bin_id=bin_ids)
        pdf["bin_fill"] = pdf["bin_id"].map(lambda b: fills[b])
        return pdf

    return narrow.groupBy("pack_group").applyInPandas(pack, schema=PACK_SCHEMA)
