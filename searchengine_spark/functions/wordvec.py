"""Word-embedding store: word2vec file loaders + parquet side table.

Reference parity: IdxWordvec.java:60-100 memory-maps a word2vec file,
keeps a term->offset map, reads the raw floats on demand and
L2-NORMALIZES ON READ. Spark-first re-expression:

- **loaders** parse the two public word2vec formats (Mikolov tool
  output): the text format (``vocab dim`` header then one
  ``term v1 .. vDIM`` line per term) and the binary format (same
  header line, then ``term<space>`` + dim little-endian float32 per
  entry). Text parsing is fully distributed (``spark.read.text`` +
  ``split``/``transform`` — each line is independent); the binary
  format is a single undelimited stream, so it is parsed as a
  driver-side generator feeding ``spark.createDataFrame`` in chunks
  (the file is vocab-bounded — a few GB at most — not corpus-bounded).
- **VectorStore** persists ``term -> array<float>`` as a parquet side
  table. Query-term vectors (k-bounded) are collected driver-side;
  doc-term vectors flow through either a broadcast map (small vocab)
  or a term equi-join against the store (web-scale vocab) — the
  switch is automatic on vocab size, mirroring how the reference's
  mmap never loads the whole file per lookup.

Normalization discipline: vectors are L2-normalized AT LOAD TIME
(float64 math, like IdxWordvec's read path) and stored normalized, so
every downstream cosine is a plain dot product.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

# Above this vocab size the store joins instead of broadcasting
# (3M x 300 float32 ~ 3.6 GB would wreck executors as a broadcast).
BROADCAST_VOCAB_MAX = 200_000


def _normalize_expr(col: str) -> F.Column:
    """L2-normalize an array<double|float> column JVM-side."""
    norm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(norm > 0, F.transform(col, lambda x: (x / norm).cast("float"))).otherwise(
        F.transform(col, lambda x: x.cast("float"))
    )


def load_word2vec_text(spark: SparkSession, path: str) -> DataFrame:
    """Distributed parse of word2vec TEXT format -> (term, vec).

    Every vector line is independent, so this scales with input splits;
    the (optional) ``vocab dim`` header line is recognized by shape
    (exactly 2 whitespace tokens) and dropped.
    """
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    df = (
        lines.where(F.length(F.trim("value")) > 0)
        .select(parts.alias("p"))
        .where(F.size("p") > 2)  # header has 2 fields; vectors have 1+dim
        .select(
            F.element_at("p", 1).alias("term"),
            F.slice("p", 2, F.size("p") - 1).cast("array<double>").alias("raw"),
        )
    )
    return df.select("term", _normalize_expr("raw").alias("vec"))


def _iter_word2vec_bin(path: str) -> Iterator[tuple[str, list[float]]]:
    """Stream (term, normalized vec) from word2vec BINARY format."""
    with open(path, "rb") as fh:
        header = b""
        while not header.endswith(b"\n"):
            ch = fh.read(1)
            if not ch:
                raise ValueError(f"{path}: truncated word2vec header")
            header += ch
        vocab, dim = (int(x) for x in header.split())
        fmt = "<" + "f" * dim
        width = 4 * dim
        for _ in range(vocab):
            term = b""
            while True:
                ch = fh.read(1)
                if not ch:
                    raise ValueError(f"{path}: truncated vocab entry")
                if ch == b" ":
                    break
                if ch != b"\n":  # the tool writes \n between entries
                    term += ch
            raw = np.asarray(struct.unpack(fmt, fh.read(width)), dtype=np.float64)
            n = float(np.linalg.norm(raw))
            vec = (raw / n if n > 0 else raw).astype(np.float32)
            yield term.decode("utf-8", errors="replace"), vec.tolist()


def load_word2vec_binary(
    spark: SparkSession, path: str, chunk_rows: int = 50_000
) -> DataFrame:
    """word2vec BINARY format -> (term, vec); driver streams, never
    holds more than ``chunk_rows`` vectors in memory at once."""
    frames = []
    buf: list[tuple[str, list[float]]] = []
    schema = "term string, vec array<float>"
    for row in _iter_word2vec_bin(path):
        buf.append(row)
        if len(buf) >= chunk_rows:
            frames.append(spark.createDataFrame(buf, schema))
            buf = []
    if buf or not frames:
        frames.append(spark.createDataFrame(buf, schema))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def load_word2vec(spark: SparkSession, path: str) -> DataFrame:
    """Auto-detect text vs binary word2vec format and load -> (term, vec)."""
    with open(path, "rb") as fh:
        header = fh.readline()
        probe = fh.read(4096)
    try:
        vocab, dim = (int(x) for x in header.split())
    except ValueError:
        return load_word2vec_text(spark, path)  # no header -> glove-style text
    # text bodies decode as ascii floats; binary bodies contain raw float32
    try:
        probe.decode("utf-8")
        return load_word2vec_text(spark, path)
    except UnicodeDecodeError:
        return load_word2vec_binary(spark, path)


class VectorStore:
    """Parquet-backed ``term -> array<float>`` store (normalized vectors).

    The scale contract: ``lookup`` is k-bounded (query terms only);
    ``as_map_or_none`` returns a driver dict only when the vocab is
    broadcast-sized, else callers must use ``join_terms`` (shuffle on
    the term key — vocab-bounded, never corpus-bounded).
    """

    def __init__(self, df: DataFrame, dim: int | None = None):
        self.df = df.select("term", "vec")
        self._dim = dim
        self._count: int | None = None

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def from_word2vec(cls, spark: SparkSession, path: str) -> "VectorStore":
        return cls(load_word2vec(spark, path))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "VectorStore":
        return cls(spark.read.parquet(path))

    def save(self, path: str) -> "VectorStore":
        self.df.write.mode("overwrite").parquet(path)
        return self

    # -- introspection ---------------------------------------------------
    @property
    def dim(self) -> int:
        if self._dim is None:
            row = self.df.select(F.size("vec").alias("d")).head()
            self._dim = int(row["d"]) if row else 0
        return self._dim

    def vocab_size(self) -> int:
        if self._count is None:
            self._count = self.df.count()
        return self._count

    # -- access patterns ---------------------------------------------------
    def lookup(self, terms: Iterable[str]) -> dict[str, np.ndarray]:
        """Driver-side vectors for a k-bounded term list (query terms)."""
        terms = list(dict.fromkeys(terms))
        rows = self.df.where(F.col("term").isin(terms)).collect()
        return {r["term"]: np.asarray(r["vec"], dtype=np.float64) for r in rows}

    def as_map_or_none(self) -> dict[str, np.ndarray] | None:
        """Full vocab as a dict IF broadcast-sized, else None."""
        if self.vocab_size() > BROADCAST_VOCAB_MAX:
            return None
        return {
            r["term"]: np.asarray(r["vec"], dtype=np.float64) for r in self.df.collect()
        }

    def join_terms(self, df: DataFrame, term_col: str = "term") -> DataFrame:
        """Left-join ``vec`` onto ``df`` by term (the web-scale path)."""
        store = self.df.withColumnRenamed("term", term_col)
        if self.vocab_size() <= BROADCAST_VOCAB_MAX:
            store = F.broadcast(store)
        return df.join(store, on=term_col, how="left")
