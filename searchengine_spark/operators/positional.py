"""Positional operators: #NEAR/n, #WINDOW/n, #SYN merge kernels.

The reference evaluates these with per-doc location iterators
(QryIopNear.java:27-83, QryIopWindow.java:27-77, QryIopSyn.java:17-71).
Here the docid alignment is a Spark inner join / groupBy (distributed,
sort-merge); only the *within-document* positional merge runs in
Python, vectorized over Arrow record batches. Position lists arrive
varbyte-delta-encoded (codec.py) and leave the same way, so the JVM
never materializes int arrays.

Semantics replicated exactly (same pointer discipline => same tf):

- NEAR/n: args must appear in order, each consecutive gap
  ``cur - prev <= n`` with ``cur > prev``; emits the LAST arg's
  position; on a match every pointer advances by one; on a distance
  failure only the first arg's pointer advances; if any non-first list
  exhausts, the document is finished.
- WINDOW/n: unordered; a match needs ``max - min < n``; emits ``max``
  and advances all pointers; otherwise every pointer advances past the
  current minimum location.
- SYN: union of lists; per-doc positions concatenated and sorted
  (argument positions assumed disjoint, QryIopSyn.java:53-54).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

from searchengine_spark.codec import decode_positions_many, encode_positions_many

MERGE_RESULT = StructType(
    [
        StructField("tf", IntegerType()),
        StructField("positions", BinaryType()),
    ]
)


def _near_merge2(a: list[int], b: list[int], dist: int) -> list[int]:
    """k=2 specialization of the generic pointer walk below — identical
    trace (pinned by test_properties): advance b past a[i]; exhaust ->
    done; gap > dist -> advance a only; match -> emit b, advance both."""
    la, lb = len(a), len(b)
    i = j = 0
    out: list[int] = []
    while i < la:
        prev = a[i]
        while j < lb and b[j] <= prev:
            j += 1
        if j >= lb:
            return out
        if b[j] - prev > dist:
            i += 1
        else:
            out.append(b[j])
            i += 1
            j += 1
    return out


def near_merge(arrays: Sequence[np.ndarray], dist: int) -> list[int]:
    """Greedy ordered-proximity merge (QryIopNear.java:40-76 semantics)."""
    k = len(arrays)
    # plain-int lists: numpy scalar indexing in the pointer loops is
    # ~10x slower than list indexing (same trick as the PNG defilter)
    arrays = [a.tolist() if isinstance(a, np.ndarray) else list(a) for a in arrays]
    if k == 2:
        if not arrays[0] or not arrays[1]:
            return []
        return _near_merge2(arrays[0], arrays[1], dist)
    return _near_merge_any(arrays, dist)


def _near_merge_any(arrays: list[list[int]], dist: int) -> list[int]:
    """Generic k-way walk (also the k=2 reference for the equivalence
    property test)."""
    k = len(arrays)
    lens = [len(a) for a in arrays]
    if any(n == 0 for n in lens):
        return []
    ptr = [0] * k
    out: list[int] = []
    while ptr[0] < lens[0]:
        found = True
        for i in range(1, k):
            prev_loc = arrays[i - 1][ptr[i - 1]]
            a = arrays[i]
            j = ptr[i]
            while j < lens[i] and a[j] <= prev_loc:
                j += 1
            ptr[i] = j
            if j >= lens[i]:
                return out  # first arg's iterator "finished" -> doc done
            if a[j] - prev_loc > dist:
                ptr[0] += 1
                found = False
                break
        if found:
            out.append(int(arrays[k - 1][ptr[k - 1]]))
            for i in range(k):
                ptr[i] += 1
    return out


def _window_merge2(a: list[int], b: list[int], dist: int) -> list[int]:
    """k=2 specialization of the generic min/max walk below — identical
    trace: match (|x-y| < dist) emits max and advances both; otherwise
    every pointer skips positions <= min (only the min side moves for
    strictly-increasing lists, but the skip loops mirror the generic
    <=-min rule exactly, including dist <= 0 on equal positions)."""
    la, lb = len(a), len(b)
    i = j = 0
    out: list[int] = []
    while i < la and j < lb:
        x = a[i]
        y = b[j]
        if x < y:
            if y - x < dist:
                out.append(y)
                i += 1
                j += 1
            else:
                i += 1
                while i < la and a[i] <= x:
                    i += 1
        elif y < x:
            if x - y < dist:
                out.append(x)
                i += 1
                j += 1
            else:
                j += 1
                while j < lb and b[j] <= y:
                    j += 1
        elif dist > 0:
            out.append(x)
            i += 1
            j += 1
        else:
            i += 1
            while i < la and a[i] <= x:
                i += 1
            j += 1
            while j < lb and b[j] <= y:
                j += 1
    return out


def window_merge(arrays: Sequence[np.ndarray], dist: int) -> list[int]:
    """Unordered min/max sliding merge (QryIopWindow.java:40-70 semantics)."""
    k = len(arrays)
    arrays = [a.tolist() if isinstance(a, np.ndarray) else list(a) for a in arrays]
    if k == 2:
        return _window_merge2(arrays[0], arrays[1], dist)
    return _window_merge_any(arrays, dist)


def _window_merge_any(arrays: list[list[int]], dist: int) -> list[int]:
    """Generic k-way walk (also the k=2 reference for the equivalence
    property test)."""
    k = len(arrays)
    lens = [len(a) for a in arrays]
    ptr = [0] * k
    out: list[int] = []
    while True:
        locs = []
        for i in range(k):
            if ptr[i] >= lens[i]:
                return out
            locs.append(arrays[i][ptr[i]])
        mn, mx = min(locs), max(locs)
        if mx - mn < dist:
            out.append(int(mx))
            for i in range(k):
                ptr[i] += 1
        else:
            for i in range(k):
                a = arrays[i]
                j = ptr[i]
                while j < lens[i] and a[j] <= mn:
                    j += 1
                ptr[i] = j


def positional_merge_udf(kind: str, dist: int, n_args: int, with_positions: bool = True):
    """pandas UDF: n binary position columns -> struct<tf, positions>.

    Rows where the merge produces no positions yield tf=0 (callers
    filter ``tf > 0`` — the reference only appends non-empty postings).
    ``with_positions=False`` (op feeds #SCORE directly, only tf is
    read) skips the batch re-encode of match positions.
    """
    merge = near_merge if kind == "near" else window_merge

    @F.pandas_udf(MERGE_RESULT)
    def _merge(*cols: pd.Series) -> pd.DataFrame:
        n = len(cols[0])
        tfs = np.zeros(n, dtype=np.int32)
        blobs: list[bytes | None] = [None] * n
        # ONE vectorized decode pass per column for the whole Arrow
        # batch — per-row decode calls were the q_near bottleneck at
        # 400k pages
        decoded = [decode_positions_many(list(c)) for c in cols]
        hit_rows: list[int] = []
        hit_pos: list[list[int]] = []
        for r in range(n):
            arrays = [decoded[c][r] for c in range(n_args)]
            pos = merge(arrays, dist)
            if pos:
                tfs[r] = len(pos)
                if with_positions:
                    hit_rows.append(r)
                    hit_pos.append(pos)
        # mirror of the decode side: ONE vectorized encode pass per batch
        for r, blob in zip(hit_rows, encode_positions_many(hit_pos)):
            blobs[r] = blob
        return pd.DataFrame({"tf": tfs, "positions": blobs})

    # The merge IS deterministic; the marker only disables Catalyst
    # optimizations that duplicate the expression — with `where(__m.tf
    # > 0)` + `select(__m.*)` the field accesses get copied into filter
    # AND project, and UDF extraction then plans TWO ArrowEvalPython
    # stages, running the whole merge twice (seen in the 400k-page
    # plans; compiler filters on the projected alias for the same
    # reason).
    return _merge.asNondeterministic()


def fused_positional_tf_udf():
    """pandas UDF for the fused positional BATCH: one Arrow pass merges
    rows belonging to DIFFERENT queries (variable arity via an
    array<binary> column, per-row kind/dist from the broadcast params
    join). Returns tf only — the fused path feeds #SCORE directly, so
    match positions are never re-encoded. Merge kernels and pointer
    discipline are the exact per-query ones (near_merge/window_merge),
    so tf is bit-identical to the per-query plans."""

    @F.pandas_udf(IntegerType())
    def _merge(pos_arrays: pd.Series, kinds: pd.Series, dists: pd.Series) -> pd.Series:
        rows = list(pos_arrays)
        kind_a = kinds.to_numpy()
        dist_a = dists.to_numpy()
        # ONE vectorized decode for every blob of every row in the batch
        flat = [b for blobs in rows for b in blobs]
        decoded = decode_positions_many(flat)
        out = np.zeros(len(rows), dtype=np.int32)
        i = 0
        for r, blobs in enumerate(rows):
            cnt = len(blobs)
            arrays, i = decoded[i : i + cnt], i + cnt
            merge = near_merge if kind_a[r] == 0 else window_merge
            out[r] = len(merge(arrays, int(dist_a[r])))
        return pd.Series(out)

    # same rationale as positional_merge_udf: prevent Catalyst from
    # duplicating the expression into two ArrowEvalPython stages
    return _merge.asNondeterministic()


@F.pandas_udf(BinaryType())
def syn_union_positions(pos_lists: pd.Series) -> pd.Series:
    """Concatenate+sort a list of encoded position lists (QryIopSyn.java:60-68)."""
    rows = list(pos_lists)
    flat = [b for blobs in rows for b in blobs if b is not None]
    decoded = decode_positions_many(flat)
    merged_lists, i = [], 0
    for blobs in rows:
        cnt = sum(1 for b in blobs if b is not None)
        arrays, i = decoded[i : i + cnt], i + cnt
        merged_lists.append(np.sort(np.concatenate(arrays)) if arrays else ())
    return pd.Series(encode_positions_many(merged_lists))
