"""Inverted-index build: docs -> positional postings DataFrames.

The reference consumed prebuilt Lucene indexes; this module is the half
Lucene did for it, re-expressed as a Spark job (cf. SURVEY.md §1.4, §7.3).

Layout (chosen for 100 TB scale, not translated from the reference):

- ``postings``   — one row per (term, field, doc): ``term string, field
  string, doc_id long, tf int, doc_len int, positions binary``. Positions are
  docID-delta + varbyte compressed (codec.py). ``doc_len`` is denormalized
  onto the posting row so BM25/Indri leaf scoring needs **no join** — the
  whole scorer is a column expression over one scan. Parquet dictionary/RLE
  encoding makes the duplication cheap; the join it removes would shuffle
  the full candidate set per query.
- ``term_stats`` — per (term, field): ``df long, ctf long`` (InvList.java
  header equivalents), broadcast-joined at query time.
- ``doc_stats``  — per (doc_id, field): ``doc_len int`` (Idx.getFieldLength).
- ``block_stats``— per (term, field, doc-id-range block): ``max_tf, min_len,
  n`` — block-max metadata for WAND-style top-k pruning. Blocks are fixed
  doc-id ranges (pure map-side agg — no per-term window, so head-term skew
  never funnels one term through one task).
- ``meta``       — corpus scalars: n_docs, per-field doc_count / sum_len /
  avg_len, analyzer name.

Skew note: posting rows are produced entirely task-locally (one
mapInPandas pass per field — a doc's postings never cross an exchange),
so the only wide op in the build is ``groupBy(term, field)`` for df/ctf
(partial aggregation map-side combines head terms before the shuffle).
We never ``collect_list`` a full posting list per term, so
stopword-grade terms cannot blow a single reducer.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field as dc_field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType

from searchengine_spark.analyzer import get_analyzer
from searchengine_spark.codec import encode_positions_many

DEFAULT_FIELDS = ("body",)
BLOCK_RANGE = 4096  # doc ids per block-max block


@F.pandas_udf(BinaryType())
def _encode_positions_udf(pos_lists: pd.Series) -> pd.Series:
    return pd.Series(encode_positions_many(pos_lists.tolist()), index=pos_lists.index)


POSTING_ROW_SCHEMA = (
    "term string, field string, doc_id long, tf int, doc_len int, positions binary"
)


def _doc_postings_gen(analyzer_name: str, fld: str, src_col: str):
    """mapInPandas kernel: one doc in -> its complete posting rows out.

    Postings are a per-(doc, term) quantity, so tokenize, position
    collection, tf, and varbyte encoding all happen inside ONE Arrow
    batch pass with NO shuffle — the posexplode->groupBy alternative
    ships one row per token occurrence (~corpus token count) through an
    exchange just to reassemble what each doc already knew. A sentinel
    row (term='') per doc carries doc_len for doc_stats.
    """
    from searchengine_spark.analyzer import get_analyzer
    from searchengine_spark.codec import encode_positions_many

    an = get_analyzer(analyzer_name)

    def gen(batches):
        for pdf in batches:
            terms, fields, dids, tfs, dls, plists = [], [], [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf[src_col]):
                did = int(did)
                toks = an.tokens(text if isinstance(text, str) else "")
                dl = len(toks)
                bypos: dict[str, list[int]] = {}
                for pos, t in enumerate(toks):
                    if t:
                        bypos.setdefault(t, []).append(pos)
                terms.append("")
                fields.append(fld)
                dids.append(did)
                tfs.append(0)
                dls.append(dl)
                plists.append(())
                for t, plist in bypos.items():
                    terms.append(t)
                    fields.append(fld)
                    dids.append(did)
                    tfs.append(len(plist))
                    dls.append(dl)
                    plists.append(plist)
            # ONE vectorized varbyte pass for the whole Arrow batch —
            # per-posting encode_positions was 63% of this kernel
            poss = encode_positions_many(plists)
            yield pd.DataFrame(
                {
                    "term": terms,
                    "field": fields,
                    "doc_id": dids,
                    "tf": tfs,
                    "doc_len": dls,
                    "positions": poss,
                }
            )

    return gen


@dataclass
class InvertedIndex:
    """Handle to the built index (lazy DataFrames + broadcast scalars)."""

    spark: SparkSession
    postings: DataFrame
    term_stats: DataFrame
    doc_stats: DataFrame
    block_stats: DataFrame | None
    docs: DataFrame  # doc_id, ext_id (+ any metadata attribute columns)
    n_docs: int
    field_stats: dict  # field -> {doc_count, sum_len, avg_len}
    analyzer: str
    fields: tuple = dc_field(default=DEFAULT_FIELDS)
    block_range: int = BLOCK_RANGE
    # set when postings carry the persisted bucket partition column:
    # term scans add a constant-foldable ``pmod(xxhash64(term), n) =
    # bucket`` predicate so only 1/n of the files are read.
    n_buckets: int | None = None

    # build-time tokenize caches (freed by materialize) and per-query
    # derived-operator caches (bounded by trim_temps) are SEPARATE lists:
    # a shared FIFO would let query traffic evict the build caches that
    # doc_stats still reads.
    _build_temps: list = dc_field(default_factory=list)
    _temps: list = dc_field(default_factory=list)

    def materialize(self) -> int:
        """Force the postings build and drop intermediate build caches."""
        n = self.postings.count()
        for fr in self._build_temps:
            try:
                fr.unpersist()
            except Exception:
                pass
        self._build_temps = []
        return n

    def release(self) -> None:
        """Unpersist EVERYTHING this handle cached (postings, stats,
        build temps, derived frames). For when the in-memory index is
        done serving — e.g. after ``write_index`` when queries move to
        the persisted copy; a 55M-posting cache left behind evicts
        later pipeline stages' caches into silent recompute (measured
        4x on the 1M-page minhash run)."""
        for fr in (
            [self.postings, self.term_stats, self.doc_stats, self.docs]
            + ([self.block_stats] if self.block_stats is not None else [])
            + self._build_temps
            + self._temps
        ):
            try:
                fr.unpersist()
            except Exception:
                pass
        self._build_temps = []
        self._temps = []

    def trim_temps(self, max_keep: int = 16) -> None:
        """Bound the derived-frame registry (NEAR/WINDOW frames persisted
        for stats): unpersist the oldest beyond ``max_keep`` so executor
        storage stays O(1) in a long-lived query session."""
        while len(self._temps) > max_keep:
            fr = self._temps.pop(0)
            try:
                fr.unpersist()
            except Exception:
                pass

    def avg_len(self, fld: str) -> float:
        return self.field_stats[fld]["avg_len"]

    def sum_len(self, fld: str) -> int:
        return self.field_stats[fld]["sum_len"]

    def doc_count(self, fld: str) -> int:
        return self.field_stats[fld]["doc_count"]


def build_index(
    docs: DataFrame,
    fields: dict[str, str] | None = None,
    doc_id_col: str = "doc_id",
    ext_id_col: str | None = None,
    analyzer: str = "english",
    with_blocks: bool = True,
    cache: bool = True,
    block_range: int = BLOCK_RANGE,
) -> InvertedIndex:
    """Tokenize ``docs`` and build the postings/stats DataFrames.

    ``fields`` maps index field name -> source column (e.g. ``{"body":
    "text", "title": "title"}``). Docs must carry a unique numeric
    ``doc_id`` (dense ids are the caller's job — e.g. ``row_number`` over
    url — so rebuilds are deterministic).
    """
    spark = docs.sparkSession
    fields = fields or {"body": "text"}
    get_analyzer(analyzer)  # fail fast on unknown analyzer names
    ext = ext_id_col or doc_id_col

    per_field = []
    stats_rows = []
    temps = []
    for fld, src in fields.items():
        # ONE Arrow pass per field: tokenize + position-collect + varbyte
        # encode inside the task that owns the doc — postings never cross
        # an exchange (the posexplode->groupBy alternative shuffles one
        # row per token occurrence). Sentinel term='' rows carry doc_len.
        rows = docs.select(
            F.col(doc_id_col).cast("long").alias("doc_id"),
            F.col(src).cast("string").alias("__src"),
        ).mapInPandas(_doc_postings_gen(analyzer, fld, "__src"), POSTING_ROW_SCHEMA)
        if cache:
            # postings AND doc_stats both read this frame; without the
            # persist the (expensive) tokenize pass runs twice
            rows = rows.persist()
            temps.append(rows)
        per_field.append(rows.where(F.col("term") != ""))
        stats_rows.append(
            rows.where((F.col("term") == "") & (F.col("doc_len") > 0)).select(
                "field", F.col("doc_id"), F.col("doc_len")
            )
        )

    postings = per_field[0]
    for p in per_field[1:]:
        postings = postings.unionByName(p)
    if cache:
        postings = postings.persist()

    doc_stats = stats_rows[0]
    for s in stats_rows[1:]:
        doc_stats = doc_stats.unionByName(s)
    doc_stats = doc_stats.select("doc_id", "field", "doc_len")

    term_stats = postings.groupBy("term", "field").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("ctf"),
    )
    if cache:
        term_stats = term_stats.persist()

    block_stats = None
    if with_blocks:
        block_stats = postings.groupBy(
            "term", "field", (F.col("doc_id") / block_range).cast("long").alias("block_id")
        ).agg(
            F.max("tf").alias("max_tf"),
            F.min("doc_len").alias("min_len"),
            F.count(F.lit(1)).alias("n"),
        )

    # corpus scalars (one small action; broadcast by value afterwards)
    n_docs = docs.count()
    fs_rows = (
        doc_stats.groupBy("field")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("doc_len").alias("sum_len"),
        )
        .collect()
    )
    field_stats = {
        r["field"]: {
            "doc_count": int(r["doc_count"]),
            "sum_len": int(r["sum_len"]),
            "avg_len": float(r["sum_len"]) / max(1, int(r["doc_count"])),
        }
        for r in fs_rows
    }
    for fld in fields:
        field_stats.setdefault(fld, {"doc_count": 0, "sum_len": 0, "avg_len": 0.0})

    doc_cols = [F.col(doc_id_col).cast("long").alias("doc_id"), F.col(ext).cast("string").alias("ext_id")]
    extra = [c for c in docs.columns if c not in (doc_id_col, ext)]
    docs_meta = docs.select(*doc_cols, *[F.col(c) for c in extra])

    return InvertedIndex(
        spark=spark,
        postings=postings,
        term_stats=term_stats,
        doc_stats=doc_stats,
        block_stats=block_stats,
        docs=docs_meta,
        n_docs=n_docs,
        field_stats=field_stats,
        analyzer=analyzer,
        fields=tuple(fields),
        block_range=block_range,
        _build_temps=temps,
    )


# ---------------------------------------------------------------------------
# Checkpoint-resumable persisted layout (north_rule: per-partition lineage)
# ---------------------------------------------------------------------------

def _dir_parquet_bytes(root: str) -> int:
    """Total parquet bytes under ``root`` (recursive — seg subdirs)."""
    if not os.path.isdir(root):
        return 0
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifest")


def _bucket_entry(path: str, bucket: int) -> str:
    return os.path.join(_manifest_dir(path), f"bucket-{bucket:05d}.json")


def write_index(
    index: InvertedIndex,
    path: str,
    buckets: int = 16,
    fingerprint: str | None = None,
    resume: bool = True,
) -> dict:
    """Persist the index, bucketed by ``xxhash64(term)`` with a lineage
    manifest per bucket (input fingerprint, rows, bytes, wall seconds).

    Resume: buckets whose manifest entry exists with a matching fingerprint
    are skipped; only missing buckets are recomputed — all in one Spark job
    (filter on the bucket column), not one job per bucket.
    """
    os.makedirs(_manifest_dir(path), exist_ok=True)
    fp = fingerprint or f"ndocs={index.n_docs}|analyzer={index.analyzer}|fields={','.join(index.fields)}"

    done: set[int] = set()
    if resume:
        for b in range(buckets):
            entry = _bucket_entry(path, b)
            if os.path.exists(entry):
                try:
                    with open(entry) as f:
                        rec = json.load(f)
                    if rec.get("fingerprint") == fp and rec.get("status") == "ok":
                        done.add(b)
                except (json.JSONDecodeError, OSError):
                    pass

    todo = [b for b in range(buckets) if b not in done]
    result = {"buckets": buckets, "skipped": sorted(done), "written": todo, "fingerprint": fp}

    bucketed = index.postings.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int")
    ).withColumn("seg", F.lit("base"))

    def _postings_work() -> float:
        t0 = time.time()
        # Salted shuffle: partitioning by bucket alone would funnel a
        # stopword-heavy bucket's entire posting mass through ONE writer
        # task at web scale. Salting by a doc-id range spreads each
        # bucket across `salt` writers (several sorted files per bucket
        # directory — readers still prune on the bucket dir, and rows
        # within each file stay (term, field, doc_id)-sorted).
        # ``seg`` is the LSM generation: streaming minor compactions
        # APPEND ``seg=bN_M`` dirs under each bucket instead of
        # rewriting the base — a web-scale index is ingested into, and
        # a full rewrite per crawl cycle does not survive 100 TB.
        #
        # Salt scales with corpus size (token count from field_stats —
        # free, no extra job): a FIXED salt means per-writer sort size
        # grows linearly with the corpus, and the external sorter falls
        # off the in-memory cliff — the 4M-page run measured 7.4x write
        # cost for 4x the postings with salt pinned at 8.
        env_salt = os.environ.get("SPARK_GRAFT_WRITE_SALT")
        if env_salt is not None:
            salt = int(env_salt)
        else:
            est_tokens = sum(
                int(v.get("sum_len", 0)) for v in index.field_stats.values()
            )
            salt = max(8, -(-est_tokens // (buckets * 500_000)))
        (
            bucketed.where(F.col("bucket").isin([int(b) for b in todo]))
            .repartition(
                max(len(todo) * salt, 1),
                "bucket",
                F.pmod(F.col("doc_id"), F.lit(salt)),
            )
            .sortWithinPartitions("term", "field", "doc_id")
            .write.mode("overwrite")
            # dynamic: only the bucket= directories present in THIS write
            # are replaced. The default (static) mode truncates the whole
            # postings dir first — a resume writing 1 todo bucket would
            # silently delete the other buckets while their manifests
            # still said ok.
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "seg")
            .parquet(os.path.join(path, "postings"))
        )
        wall = time.time() - t0
        for b in todo:
            bdir = os.path.join(path, "postings", f"bucket={b}")
            nbytes = _dir_parquet_bytes(bdir)
            rec = {
                "bucket": b,
                "fingerprint": fp,
                "status": "ok",
                "bytes": nbytes,
                "wall_sec_total_job": round(wall, 3),
                "written_at_monotonic": round(t0, 3),
            }
            tmp = _bucket_entry(path, b) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, _bucket_entry(path, b))
        return wall

    # Side tables: idempotent under resume — if meta.json already records
    # this fingerprint they are complete; rewriting would also self-clobber
    # when `index` was read from this very path.
    meta_path = os.path.join(path, "meta.json")
    sides_done = False
    if resume and os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                sides_done = json.load(f).get("fingerprint") == fp
        except (json.JSONDecodeError, OSError):
            sides_done = False
    result["sides_skipped"] = sides_done

    # LSM side-table layout: every table is a set of append-only
    # ``seg=`` partition dirs (term-keyed ones additionally bucketed
    # by the postings' term hash). A streaming minor compaction then
    # APPENDS delta-derived seg dirs — df/ctf/block maxima are
    # additive/mergeable, so ``read_index`` folds segments with a
    # vocab-sized aggregate instead of anyone rewriting base data.
    def _with_bucket(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int")
        ).withColumn("seg", F.lit("base"))

    def _timed_write(fn) -> float:
        t0 = time.time()
        fn()
        return time.time() - t0

    def _term_stats_work() -> float:
        return _timed_write(
            lambda: _with_bucket(index.term_stats)
            .repartition(buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket", "seg")
            .parquet(os.path.join(path, "term_stats"))
        )

    def _doc_stats_work() -> float:
        return _timed_write(
            lambda: index.doc_stats.withColumn("seg", F.lit("base"))
            .write.mode("overwrite")
            .partitionBy("seg")
            .parquet(os.path.join(path, "doc_stats"))
        )

    def _block_stats_work() -> float:
        return _timed_write(
            lambda: _with_bucket(index.block_stats)
            .repartition(buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket", "seg")
            .parquet(os.path.join(path, "block_stats"))
        )

    def _docs_work() -> float:
        return _timed_write(
            lambda: index.docs.withColumn("seg", F.lit("base"))
            .write.mode("overwrite")
            .partitionBy("seg")
            .parquet(os.path.join(path, "docs"))
        )

    # The five writes are independent Spark jobs over cached inputs —
    # run them concurrently so the per-job fixed costs (scheduling,
    # dynamic-overwrite commit, parquet footer fsyncs) and the straggler
    # tails overlap instead of adding (same discipline as compaction's
    # threaded seg writes, streaming/ingest.py).
    from concurrent.futures import ThreadPoolExecutor

    phases: dict[str, float] = {}
    with ThreadPoolExecutor(max_workers=5) as pool:
        futures = {}
        if todo:
            futures["postings"] = pool.submit(_postings_work)
        if not sides_done:
            futures["term_stats"] = pool.submit(_term_stats_work)
            futures["doc_stats"] = pool.submit(_doc_stats_work)
            if index.block_stats is not None:
                futures["block_stats"] = pool.submit(_block_stats_work)
            futures["docs"] = pool.submit(_docs_work)
        for name, fut in futures.items():
            phases[name] = round(fut.result(), 3)
    result["phase_sec"] = phases
    from searchengine_spark.analyzer import analyzer_version

    meta = {
        "n_docs": index.n_docs,
        "field_stats": index.field_stats,
        "analyzer": index.analyzer,
        # behavior hash of the analyzer's rule tables: read_index fails
        # loudly if the code's stemmer/stopword rules drifted since this
        # index was written (silent index/query tokenize mismatch otherwise)
        "analyzer_version": analyzer_version(index.analyzer),
        "fields": list(index.fields),
        "buckets": buckets,
        "fingerprint": fp,
        "block_range": index.block_range,
        "layout": 3,
    }
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, "meta.json"))
    return result


def read_index(spark: SparkSession, path: str) -> InvertedIndex:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    persisted_ver = meta.get("analyzer_version")
    if persisted_ver is not None:
        from searchengine_spark.analyzer import analyzer_version

        current = analyzer_version(meta["analyzer"])
        if current != persisted_ver:
            raise ValueError(
                f"index at {path} was written with analyzer "
                f"{meta['analyzer']!r} version {persisted_ver} but this "
                f"code's rule tables hash to {current}: query-time "
                "tokenization would silently mismatch the persisted terms. "
                "Rebuild the index (or check out the matching code)."
            )
    postings = spark.read.parquet(os.path.join(path, "postings"))
    if "seg" in postings.columns:
        postings = postings.drop("seg")  # LSM generation dir — internal
    block_path = os.path.join(path, "block_stats")

    def _side(name: str) -> DataFrame:
        # LSM layouts partition side tables (bucket / seg) so streaming
        # compaction can append instead of rewrite; helpers are internal
        df = spark.read.parquet(os.path.join(path, name))
        for helper in ("bucket", "seg"):
            if helper in df.columns:
                df = df.drop(helper)
        return df

    def _term_stats() -> DataFrame:
        df = spark.read.parquet(os.path.join(path, "term_stats"))
        if "seg" in df.columns:
            # df/ctf are sums — fold the append-only segments at read
            # time (vocab-sized agg; minor compaction never rewrites
            # the base stats segment). ``bucket`` is functionally
            # determined by term, so keeping it in the keys changes no
            # group — and lets stats prefetch prune partition dirs.
            keys = ["bucket", "term", "field"] if "bucket" in df.columns else ["term", "field"]
            return df.groupBy(*keys).agg(
                F.sum("df").cast("long").alias("df"),
                F.sum("ctf").cast("long").alias("ctf"),
            )
        return df

    def _block_stats() -> DataFrame | None:
        if not os.path.isdir(block_path):
            return None
        df = spark.read.parquet(block_path)
        if "seg" in df.columns:
            # block maxima/minima/counts merge associatively across segs
            return df.groupBy("term", "field", "block_id").agg(
                F.max("max_tf").alias("max_tf"),
                F.min("min_len").alias("min_len"),
                F.sum("n").alias("n"),
            )
        return df.drop("bucket") if "bucket" in df.columns else df

    return InvertedIndex(
        spark=spark,
        postings=postings,
        term_stats=_term_stats(),
        doc_stats=_side("doc_stats"),
        block_stats=_block_stats(),
        docs=_side("docs"),
        n_docs=meta["n_docs"],
        field_stats=meta["field_stats"],
        analyzer=meta["analyzer"],
        fields=tuple(meta["fields"]),
        block_range=meta.get("block_range", BLOCK_RANGE),
        n_buckets=int(meta["buckets"]),
    )


def assign_doc_ids(
    docs: DataFrame, ext_id_col: str = "url", partitions: int | None = None
) -> DataFrame:
    """Deterministic dense doc ids, ascending in external-id order.

    A naive ``row_number() over (order by url)`` funnels the whole
    corpus through ONE task — and everything downstream (tokenization,
    posting build) inherits that single partition. Instead:

    1. range-partition by url (parallel global sort) and cache so the
       partition layout is frozen,
    2. count rows per partition (tiny collect) -> cumulative offsets,
    3. doc_id = partition offset + (row_number within partition) - 1.

    The mapping is invariant to the sampled range boundaries (a doc's
    id is exactly the number of urls before it), so rebuilds are
    reproducible; each partition numbers itself in parallel.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism * 2
    part = docs.repartitionByRange(p, F.col(ext_id_col)).persist()
    with_pid = part.withColumn("__pid", F.spark_partition_id())
    counts = {
        int(r["__pid"]): int(r["cnt"])
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("__pid").orderBy(F.col(ext_id_col))
    return (
        with_pid.withColumn(
            "doc_id",
            (F.row_number().over(w).cast("long") - 1 + omap[F.col("__pid")]).cast("long"),
        )
        .drop("__pid")
    )
