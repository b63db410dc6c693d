"""Multi-dictionary suggest service: named index registry + hot reindex +
per-dictionary Suggest/Autocomplete — the Spark form of the reference's
Service (/root/reference/pkg/suggest/service.go:20-91: a name → (NGramIndex,
Dictionary) map swapped atomically under sync.RWMutex, reindexed live via
SIGHUP/POST, internal/suggest/api/app.go:47-68).

Spark mapping: an index "build" is a DataFrame plan over the dictionary
table (optionally materialized to a ``partitionBy("size")`` parquet
warehouse path — the DISC driver; cached in memory — the RAM driver); a
reindex is a REBUILD + ATOMIC SWAP of the registry entry.  The Python
``threading.Lock`` only guards the registry dict itself.

Reader isolation is PER DRIVER: RAM entries are cached immutable lineage,
so concurrent queries against a swapped-out entry keep their snapshot (the
reader-isolation the reference needs the RWMutex for).  DISC entries point
at parquet FILES — ``add_disc_index(rebuild=True)`` on a live name and
``upsert_disc_index`` rewrite those files in place, so a query running
against the OLD entry during the rewrite can fail or read mixed
partitions.  On plain parquet, quiesce queries around a DISC rewrite or
write to a fresh path and swap; a transactional table format
(Iceberg/Delta — sources/tables.py) restores true snapshot isolation
without either.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, IndexConfig
from ..functions.metrics import Metric
from .indexing import build_ngram_index, read_ngram_index, write_ngram_index
from .suggest import autocomplete_firstk, suggest_topk


@dataclass(frozen=True)
class _Entry:
    dictionary: DataFrame
    index: DataFrame
    config: IndexConfig
    path: str | None = None  # DISC entries: the size-partitioned warehouse dir


class SuggestService:
    """Named registry of (dictionary, n-gram index) pairs.

    ``add_ram_index``   — RAM driver: index plan cached in executor memory.
    ``add_disc_index``  — DISC driver: index written to (or read from) a
                          size-partitioned parquet path.
    Re-adding a name REBUILDS and atomically swaps the entry — the hot
    reindex path (service.go:78-91 AddIndex under Lock).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._lock = threading.Lock()
        self._entries: dict[str, _Entry] = {}

    # -- registration ------------------------------------------------------

    def add_ram_index(
        self,
        name: str,
        dictionary: DataFrame,
        config: IndexConfig = DEFAULT_CONFIG,
    ) -> None:
        index = build_ngram_index(dictionary, config=config).cache()
        index.count()  # materialize before the swap, like builder.Build()
        self._swap(name, _Entry(dictionary, index, config))

    def add_disc_index(
        self,
        name: str,
        dictionary: DataFrame,
        path: str,
        config: IndexConfig = DEFAULT_CONFIG,
        rebuild: bool = True,
    ) -> None:
        if rebuild:
            write_ngram_index(build_ngram_index(dictionary, config=config), path)
        index = read_ngram_index(self.spark, path)
        self._swap(name, _Entry(dictionary, index, config, path))

    def load_disc_index(
        self,
        name: str,
        warehouse_dir: str,
        config: IndexConfig = DEFAULT_CONFIG,
    ) -> None:
        """Boot a DISC entry from an ``indexer_job`` run's artifacts —
        ``<warehouse>/<name>_dictionary`` + ``<warehouse>/<name>_index``
        (jobs/indexer_job.py layout; the reference's service startup reads
        the indexer's output the same way, service.go:20-45).  No rebuild:
        the on-disk index is served as-is."""
        import os

        from ..sources.dictionary import read_dictionary

        dictionary = read_dictionary(self.spark, os.path.join(warehouse_dir, f"{name}_dictionary"))
        path = os.path.join(warehouse_dir, f"{name}_index")
        index = read_ngram_index(self.spark, path)
        self._swap(name, _Entry(dictionary, index, config, path))

    def upsert_disc_index(
        self,
        name: str,
        new_docs: DataFrame,
        deleted_ids: DataFrame | None = None,
    ) -> dict:
        """Incremental hot reindex of a DISC entry: merge/delete documents
        through :func:`upsert_ngram_index` (only affected ``size=``
        partitions rewritten) and atomically swap the refreshed entry —
        the trickle-update form of the reference's full rebuild+swap
        (service.go:78-91).  ``new_docs`` is ``(doc_id, value)``; a doc_id
        already present is replaced.

        The rewrite is IN PLACE on the entry's parquet path: queries
        concurrently reading the old entry may fail mid-rewrite (see the
        module docstring's reader-isolation note) — quiesce them, or use a
        transactional table format for snapshot isolation."""
        from .indexing import upsert_ngram_index

        e = self._get(name)
        if e.path is None:
            raise ValueError(f"{name!r} is a RAM entry; use add_ram_index to rebuild")
        stats = upsert_ngram_index(
            self.spark, e.path, new_docs, e.config, deleted_ids
        )
        drop = new_docs.select("doc_id")
        if deleted_ids is not None:
            drop = drop.unionByName(
                deleted_ids.select(F.col(deleted_ids.columns[0]).alias("doc_id"))
            )
        dictionary = (
            e.dictionary.join(drop.distinct(), "doc_id", "left_anti")
            .unionByName(new_docs.select("doc_id", "value"))
            .cache()
        )
        dictionary.count()
        index = read_ngram_index(self.spark, e.path)
        self._swap(name, _Entry(dictionary, index, e.config, e.path))
        return stats

    def _swap(self, name: str, entry: _Entry) -> None:
        with self._lock:
            old = self._entries.get(name)
            self._entries[name] = entry
        if old is not None and old.index.is_cached:
            old.index.unpersist()

    def _get(self, name: str) -> _Entry:
        with self._lock:
            if name not in self._entries:
                raise KeyError(f"unknown dictionary: {name!r}")
            return self._entries[name]

    def dictionaries(self) -> list[str]:
        with self._lock:
            return sorted(self._entries)

    # -- queries -----------------------------------------------------------

    def suggest(
        self,
        name: str,
        query: str,
        metric: Metric,
        similarity: float,
        topk: int,
    ) -> list[tuple[float, str]]:
        """Top-k ``(score, value)`` for one query — ResultItem parity
        (service.go:105-139)."""
        e = self._get(name)
        q = self.spark.createDataFrame([(0, query)], "query_id long, query string")
        rows = suggest_topk(
            e.index, q, metric, similarity, topk, e.config, dictionary=e.dictionary
        ).collect()
        return [(r["score"], r["value"]) for r in rows]

    def autocomplete(self, name: str, query: str, topk: int) -> list[str]:
        """First-k values in docID order (service.go:142-173)."""
        e = self._get(name)
        q = self.spark.createDataFrame([(0, query)], "query_id long, query string")
        rows = autocomplete_firstk(
            e.index, q, topk, e.config, dictionary=e.dictionary
        ).collect()
        return [r["value"] for r in rows]
