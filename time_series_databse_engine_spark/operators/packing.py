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
        # Exact first-fit via a min-fill SEGMENT TREE over bin slots
        # (round 10): the naive scan re-probes every existing bin per
        # doc — O(n²) per group once bins run full, measured 2.7 s →
        # 14.5 s isolated for 3× docs (sf1→sf3, e≈1.5).  The tree holds
        # each slot's current fill (empty slots 0, contiguous on the
        # left), so "first bin with fill + t ≤ max_tokens" is one
        # root-to-leaf descent — and because the leftmost EMPTY slot
        # also satisfies the predicate, "no existing bin fits → open
        # bin len(fills)" falls out of the same query: placements are
        # bit-identical to the linear scan (the recursive-CTE oracle
        # replays them), at O(n log n).
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        ts = pdf["n_tokens"].tolist()
        n = len(ts)
        tree_size = 1
        while tree_size < n + 1:
            tree_size <<= 1
        tree = [0] * (2 * tree_size)  # min fill per subtree; leaves = slots

        def update(pos: int, fill: int) -> None:
            i = pos + tree_size
            tree[i] = fill
            i >>= 1
            while i:
                tree[i] = min(tree[2 * i], tree[2 * i + 1])
                i >>= 1

        fills: list[int] = []  # bin_id -> current fill
        bin_ids = []
        for t in ts:
            limit = max_tokens - t
            if limit < 0 or tree[1] > limit:
                placed = len(fills)  # oversize doc: a bin of its own
                fills.append(0)
            else:
                i = 1
                while i < tree_size:  # descend to FIRST slot with fill ≤ limit
                    i = 2 * i if tree[2 * i] <= limit else 2 * i + 1
                placed = i - tree_size
                if placed == len(fills):  # leftmost empty slot = new bin
                    fills.append(0)
            fills[placed] += int(t)
            update(placed, fills[placed])
            bin_ids.append(placed)
        pdf = pdf.assign(bin_id=bin_ids)
        pdf["bin_fill"] = pdf["bin_id"].map(lambda b: fills[b])
        return pdf

    return narrow.groupBy("pack_group").applyInPandas(pack, schema=PACK_SCHEMA)
